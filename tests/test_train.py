"""End-to-end smoke tests: synthetic data -> dataset -> train step -> eval."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar4d_tpu.data import KITTI360Dataset, generate_synthetic_sequence
from lidar4d_tpu.models import LiDAR4DConfig, LiDAR4DField
from lidar4d_tpu.train.ema import ema_init, ema_params, ema_update
from lidar4d_tpu.train.flow_cache import build_flow_cache
from lidar4d_tpu.train.losses import LossConfig
from lidar4d_tpu.train.refine import onecycle_lr, refine_unet
from lidar4d_tpu.train.train_step import init_train_state, make_train_step

H, W, FRAMES = 16, 64, 6
SEQ = "9000"


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    scale, offset = generate_synthetic_sequence(
        root, sequence_id=SEQ, num_frames=FRAMES, H=H, W=W, val_every=3
    )
    return root, scale, offset


@pytest.fixture(scope="module")
def tiny_setup(synth_root):
    root, scale, offset = synth_root
    ds = KITTI360Dataset(
        split="train", root_path=root, sequence_id=SEQ,
        scale=scale, offset=offset, num_rays_lidar=64,
    )
    cfg = LiDAR4DConfig(
        base_resolution=16, max_resolution=64, log2_hashmap_size=10,
        n_levels_hash=4, n_levels_plane=2, min_resolution=8,
        time_resolution=4, num_frames=FRAMES,
        near_lidar=1.0 * scale, far_lidar=81.0 * scale, bound=1.0,
        flow_n_levels=4, flow_log2_hashmap_size=10,
        flow_base_resolution=8, flow_max_resolution=32,
    )
    field = LiDAR4DField(cfg)
    loss_cfg = LossConfig(flow_loss=False, scale=scale, num_frames=FRAMES, iters=100)
    return ds, field, loss_cfg, scale


def test_synthetic_dataset_format(synth_root):
    root, scale, offset = synth_root
    for split, n in (("train", 4), ("val", 2), ("test", 2)):
        ds = KITTI360Dataset(
            split=split, root_path=root, sequence_id=SEQ,
            scale=scale, offset=offset,
        )
        assert len(ds) == n
        assert ds.images_lidar.shape == (n, H, W, 3)
        assert ds.poses_lidar.shape == (n, 4, 4)
    # poses scaled into the unit box
    assert np.abs(ds.poses_lidar[:, :3, 3]).max() <= 1.0
    # times normalized
    assert ds.times.min() >= 0.0 and ds.times.max() <= 1.0
    # raydrop channel is binary and matches depth
    img = ds.images_lidar[0]
    np.testing.assert_array_equal(img[..., 0], (img[..., 2] != 0).astype(np.float32))


def test_train_step_decreases_loss(tiny_setup):
    ds, field, loss_cfg, scale = tiny_setup
    state, opt = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2, iters=100)
    step = make_train_step(
        field, opt, loss_cfg, H=H, W=W, fov_lidar=(2.0, 26.9),
        num_rays=64, num_steps=16, patch_size=1,
    )
    key = jax.random.PRNGKey(1)
    losses = []
    for it in range(20):
        key, k = jax.random.split(key)
        frame = jax.tree.map(jnp.asarray, ds.frame(it % len(ds)))
        state, metrics = step(state, frame, None, k)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 20
    # optimizing: mean of last 5 below mean of first 5
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_train_step_patch_mode_grad_loss(tiny_setup):
    ds, field, loss_cfg, scale = tiny_setup
    state, opt = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2, iters=100)
    step = make_train_step(
        field, opt, loss_cfg, H=H, W=W, fov_lidar=(2.0, 26.9),
        num_rays=64, num_steps=16, patch_size=(2, 8),
    )
    frame = jax.tree.map(jnp.asarray, ds.frame(0))
    state, metrics = step(state, frame, None, jax.random.PRNGKey(2))
    assert "grad_loss" in metrics
    assert np.isfinite(float(metrics["loss"]))


def test_flow_cache_and_flow_loss(synth_root, tiny_setup):
    root, scale, offset = synth_root
    ds, field, _, _ = tiny_setup
    refine_ds = KITTI360Dataset(
        split="refine", root_path=root, sequence_id=SEQ,
        scale=scale, offset=offset,
    )
    cache = build_flow_cache(refine_ds, scale, FRAMES)
    assert cache["points"].shape[0] == FRAMES
    assert cache["valid"].sum() == len(refine_ds)
    # masked points are finite, padding is sentinel
    m = cache["mask"][cache["valid"] > 0][0]
    pts = cache["points"][cache["valid"] > 0][0]
    assert np.abs(pts[m > 0]).max() < 10.0  # world coords are scaled
    assert pts[m == 0].min() > 1e6

    loss_cfg = LossConfig(flow_loss=True, scale=scale, num_frames=FRAMES, iters=100)
    state, opt = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2, iters=100)
    step = make_train_step(
        field, opt, loss_cfg, H=H, W=W, fov_lidar=(2.0, 26.9),
        num_rays=32, num_steps=8, patch_size=1,
    )
    cache_dev = jax.tree.map(jnp.asarray, cache)
    frame = jax.tree.map(jnp.asarray, ds.frame(1))
    state, metrics = step(state, frame, cache_dev, jax.random.PRNGKey(3))
    assert "flow_loss" in metrics
    assert np.isfinite(float(metrics["flow_loss"]))


def test_urf_loss_finite(tiny_setup):
    ds, field, _, scale = tiny_setup
    loss_cfg = LossConfig(
        flow_loss=False, urf_loss=True, scale=scale, num_frames=FRAMES, iters=100
    )
    state, opt = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2, iters=100)
    step = make_train_step(
        field, opt, loss_cfg, H=H, W=W, fov_lidar=(2.0, 26.9),
        num_rays=32, num_steps=8, patch_size=1,
    )
    frame = jax.tree.map(jnp.asarray, ds.frame(0))
    state, metrics = step(state, frame, None, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["urf_loss"]))


def test_ema_torch_ema_ramp():
    params = {"w": jnp.ones((3,))}
    ema = ema_init(params)
    new = {"w": jnp.zeros((3,))}
    ema = ema_update(ema, new, decay=0.95)
    # first update: decay_eff = min(0.95, 2/11)
    d = 2.0 / 11.0
    np.testing.assert_allclose(ema_params(ema)["w"], d * np.ones(3), rtol=1e-6)


def test_onecycle_schedule_shape():
    sched = onecycle_lr(1e-3, 1000)
    lrs = np.array([float(sched(s)) for s in [0, 150, 299, 600, 999]])
    assert lrs[0] == pytest.approx(1e-3 / 25, rel=1e-3)
    assert lrs[2] == pytest.approx(1e-3, rel=1e-2)
    assert lrs[4] < 1e-6
    assert lrs.argmax() == 2


def test_refine_unet_improves_bce():
    from lidar4d_tpu.models import UNet

    unet = UNet()
    variables = unet.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, 3, 16, 32)).astype(np.float32))
    gt = jnp.asarray((rng.uniform(size=(2, 1, 16, 32)) > 0.5).astype(np.float32))
    logs = []
    new_vars = refine_unet(
        unet, variables, x, gt, steps=30, lr=1e-3,
        key=jax.random.PRNGKey(1), log_fn=lambda m: logs.append(m), log_every=29,
    )
    first = float(logs[0].split()[-1])
    last = float(logs[-1].split()[-1])
    assert np.isfinite(last)
    assert last < first  # optimizing


def test_flow_cache_max_points_subsamples(synth_root):
    root, scale, offset = synth_root
    ds = KITTI360Dataset(
        split="refine", root_path=root, sequence_id=SEQ,
        scale=scale, offset=offset,
    )
    capped = build_flow_cache(ds, scale, FRAMES, max_points=128)
    assert capped["points"].shape[1] <= max(128, 1024)  # padded to align
    # every frame capped (point_removal's RANSAC uses global random state,
    # so exact counts vary run-to-run — the cap is the contract)
    valid = capped["valid"] > 0
    assert (capped["mask"][valid].sum(axis=1) <= 128).all()
    assert (capped["gmask"][valid].sum(axis=1) <= 32).all()


def test_flat_optimizer_matches_grouped_bitwise():
    """make_optimizer (flat single-vector Adam) == make_grouped_optimizer
    (multi_transform spec) bitwise over several steps, including the UNet
    zero-update group and the 0.1x head LR."""
    import optax

    from lidar4d_tpu.train.optimizer import make_grouped_optimizer, make_optimizer

    cfg = LiDAR4DConfig(num_frames=5)
    field = LiDAR4DField(cfg)
    params = field.init(jax.random.PRNGKey(0))
    labels = field.param_group_labels(params)

    flat_opt = make_optimizer(1e-2, 100, labels)
    grp_opt = make_grouped_optimizer(1e-2, 100, labels)
    s_f = flat_opt.init(params)
    s_g = grp_opt.init(params)
    p_f = p_g = params

    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        ks = jax.random.split(k, len(jax.tree.leaves(params)))
        grads = jax.tree.unflatten(
            jax.tree.structure(params),
            [jax.random.normal(kk, l.shape, l.dtype)
             for kk, l in zip(ks, jax.tree.leaves(params))],
        )
        u_f, s_f = flat_opt.update(grads, s_f, p_f)
        u_g, s_g = grp_opt.update(grads, s_g, p_g)
        p_f = optax.apply_updates(p_f, u_f)
        p_g = optax.apply_updates(p_g, u_g)
        for a, b in zip(jax.tree.leaves(p_f), jax.tree.leaves(p_g)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # unet params untouched
    for a, b in zip(jax.tree.leaves(p_f["unet"]), jax.tree.leaves(params["unet"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
