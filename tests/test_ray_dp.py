"""Ray-batch data parallelism: sharded training == single-device training.

The DP design (SURVEY §2.3) shards the sampled ray batch over a 1-D mesh
via sharding constraints and lets GSPMD insert the gradient psum; parameters
stay replicated. These tests prove the collective math: N optimizer steps on
an 8-virtual-device mesh must produce (numerically) the same parameters as
the identical steps on one device — a wrong psum (e.g. off by n_devices) or
a wrong ray partitioning fails the allclose.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar4d_tpu.data import KITTI360Dataset, generate_synthetic_sequence
from lidar4d_tpu.models import LiDAR4DConfig, LiDAR4DField
from lidar4d_tpu.parallel.mesh import make_mesh, replicate
from lidar4d_tpu.train.flow_cache import build_flow_cache
from lidar4d_tpu.train.losses import LossConfig
from lidar4d_tpu.train.train_step import init_train_state, make_train_step

H, W, FRAMES = 16, 64, 6
SEQ = "9100"
N_STEPS = 3
NUM_RAYS = 64


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth_dp"))
    scale, offset = generate_synthetic_sequence(
        root, sequence_id=SEQ, num_frames=FRAMES, H=H, W=W, val_every=3
    )
    ds = KITTI360Dataset(
        split="train", root_path=root, sequence_id=SEQ,
        scale=scale, offset=offset, num_rays_lidar=NUM_RAYS,
    )
    refine_ds = KITTI360Dataset(
        split="refine", root_path=root, sequence_id=SEQ,
        scale=scale, offset=offset,
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
    loss_cfg = LossConfig(flow_loss=True, scale=scale, num_frames=FRAMES,
                          iters=100)
    cache = jax.tree.map(
        jnp.asarray, build_flow_cache(refine_ds, scale, FRAMES, verbose=False)
    )
    return ds, field, loss_cfg, cache


def _run(field, loss_cfg, ds, cache, mesh, n_steps=N_STEPS):
    state, opt = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2,
                                  iters=100)
    if mesh is not None:
        state = replicate(mesh, state)
        cache = replicate(mesh, cache)
    step = make_train_step(
        field, opt, loss_cfg, H=H, W=W, fov_lidar=(2.0, 26.9),
        num_rays=NUM_RAYS, num_steps=16, patch_size=1, mesh=mesh,
    )
    key = jax.random.PRNGKey(42)
    metrics = None
    for it in range(n_steps):
        key, k = jax.random.split(key)
        frame = jax.tree.map(jnp.asarray, ds.frame(it % len(ds)))
        state, metrics = step(state, frame, cache, k)
    return state, metrics


def test_sharded_step_matches_single_device(setup):
    ds, field, loss_cfg, cache = setup
    assert len(jax.devices()) >= 8, "virtual mesh missing"

    state_1, metrics_1 = _run(field, loss_cfg, ds, cache, mesh=None)
    state_8, metrics_8 = _run(field, loss_cfg, ds, cache, mesh=make_mesh(8))

    # identical loss trajectory end-point...
    np.testing.assert_allclose(
        float(metrics_8["loss"]), float(metrics_1["loss"]), rtol=1e-4
    )
    # ...and identical parameters: a gradient psum off by any factor, a
    # dropped shard, or a wrong ray partition all diverge within one step
    flat_1, tree_def = jax.tree.flatten(state_1.params)
    flat_8, tree_def8 = jax.tree.flatten(state_8.params)
    assert tree_def == tree_def8
    for a, b in zip(flat_1, flat_8):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-6
        )


def test_sharded_step_matches_single_device_plane_hash_scales(setup):
    """The round-5 config-flip gate (CLAUDE.md invariant: per-sample encode
    structure changes must pass strict sharded==unsharded): the
    plane_hash_scales field — top static plane scales hash-compressed onto
    the gather kernel — must reproduce unsharded params on the 8-device
    mesh before the flagship config may enable it."""
    import dataclasses

    ds, field, loss_cfg, cache = setup
    # top plane scale here is (min_resolution*2)^2 = 256 verts > 2^6 rows,
    # so hashing engages; same eligibility shape as the flagship (1, 14) arm
    cfg = dataclasses.replace(field.cfg, plane_hash_scales=1,
                              plane_hash_log2=6)
    f = LiDAR4DField(cfg)
    state_1, metrics_1 = _run(f, loss_cfg, ds, cache, mesh=None, n_steps=2)
    state_8, metrics_8 = _run(f, loss_cfg, ds, cache, mesh=make_mesh(8),
                              n_steps=2)
    np.testing.assert_allclose(
        float(metrics_8["loss"]), float(metrics_1["loss"]), rtol=1e-4
    )
    flat_1, tree_def = jax.tree.flatten(state_1.params)
    flat_8, tree_def8 = jax.tree.flatten(state_8.params)
    assert tree_def == tree_def8
    for a, b in zip(flat_1, flat_8):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-6)


def test_hierarchical_mesh_matches_single_device(setup):
    """(dcn=2, ici=4) pod layout: same params as unsharded after N steps."""
    from lidar4d_tpu.parallel.mesh import make_hierarchical_mesh

    ds, field, loss_cfg, cache = setup
    state_1, metrics_1 = _run(field, loss_cfg, ds, cache, mesh=None,
                              n_steps=2)
    state_h, metrics_h = _run(field, loss_cfg, ds, cache,
                              mesh=make_hierarchical_mesh(2, 4), n_steps=2)
    np.testing.assert_allclose(
        float(metrics_h["loss"]), float(metrics_1["loss"]), rtol=1e-4
    )
    flat_1, tree_def = jax.tree.flatten(state_1.params)
    flat_h, tree_defh = jax.tree.flatten(state_h.params)
    assert tree_def == tree_defh
    for a, b in zip(flat_1, flat_h):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-6)


def test_sharded_gradient_scale(setup):
    """Catch psum scale bugs directly: one step from identical params must
    move the sigma-net weights by the same delta (not n_devices x)."""
    ds, field, loss_cfg, cache = setup
    s1, _ = _run(field, loss_cfg, ds, cache, mesh=None, n_steps=1)
    s8, _ = _run(field, loss_cfg, ds, cache, mesh=make_mesh(8), n_steps=1)
    state0, _ = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2,
                                 iters=100)
    d1 = np.asarray(s1.params["sigma"][0] - state0.params["sigma"][0])
    d8 = np.asarray(s8.params["sigma"][0] - state0.params["sigma"][0])
    denom = max(np.abs(d1).max(), 1e-12)
    assert np.abs(d8 - d1).max() / denom < 1e-3


def test_render_staged_sharded_matches_single():
    """render_staged over an 8-device mesh == single-device (rays are
    embarrassingly parallel at inference; params replicated)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
    from lidar4d_tpu.models.renderer import render_staged
    from lidar4d_tpu.parallel.mesh import make_mesh, replicate

    cfg = LiDAR4DConfig(
        n_levels_hash=2, n_features_per_level_hash=4, log2_hashmap_size=8,
        base_resolution=8, max_resolution=16, n_levels_plane=2,
        min_resolution=8, flow_n_levels=2, flow_log2_hashmap_size=8,
        flow_base_resolution=8, flow_max_resolution=16,
        near_lidar=0.01, far_lidar=0.81, num_frames=4,
        remat_density=False, density_chunk=0,
    )
    field = LiDAR4DField(cfg)
    params = field.init(jax.random.PRNGKey(0))
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    n = 100
    rays_o = jax.random.uniform(k1, (n, 3), minval=-0.1, maxval=0.1)
    rays_d = jax.random.normal(k2, (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = jnp.float32(0.5)

    ref = render_staged(field, params, rays_o, rays_d, t,
                        num_steps=16, chunk=64)
    mesh = make_mesh(8)
    out = render_staged(field, replicate(mesh, params), rays_o, rays_d, t,
                        num_steps=16, chunk=64, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out["depth_lidar"]),
                               np.asarray(ref["depth_lidar"]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out["image_lidar"]),
                               np.asarray(ref["image_lidar"]),
                               rtol=2e-5, atol=2e-6)
