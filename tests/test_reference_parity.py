"""Golden parity vs the ACTUAL reference PyTorch code (CPU).

torch (cpu) is available in this environment, and several reference modules
are importable standalone — so instead of testing against reimplementations,
these tests load `/root/reference/model/planes_field.py`, `model/unet.py`,
`model/activation.py`, `data/base_dataset.py`, inject identical weights into
the JAX modules, and assert output equality:

  * Planes4D static/dynamic forward (product reduction, multiscale concat,
    reversed-reso grid layout, grid_sample align_corners/border semantics);
  * UNet eval-mode forward (incl. the bottleneck attention `h.view(B,H,W,C)`
    flatten order and the padded-skip concat);
  * volume compositing weights (renderer.py:98-104);
  * get_lidar_rays full-frame rays and sampled-index rays;
  * trunc_exp forward + clamped gradient (activation.py:6-20).
"""

import importlib.util
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_planes_mod():
    return _load("ref_planes_field", f"{REF}/model/planes_field.py")


@pytest.fixture(scope="module")
def ref_unet_mod():
    return _load("ref_unet", f"{REF}/model/unet.py")


@pytest.fixture(scope="module")
def ref_activation_mod():
    return _load("ref_activation", f"{REF}/model/activation.py")


@pytest.fixture(scope="module")
def ref_base_dataset_mod():
    return _load("ref_base_dataset", f"{REF}/data/base_dataset.py")


# --------------------------------------------------------------- Planes4D
def test_planes4d_matches_reference(ref_planes_mod):
    from lidar4d_tpu.models.planes_field import Planes4D

    torch.manual_seed(0)
    ref = ref_planes_mod.Planes4D(
        output_dim=8, resolution=[16, 16, 16, 8], multiscale_res=[1, 2]
    )
    ours = Planes4D(output_dim=8, resolution=(16, 16, 16, 8),
                    multiscale_res=(1, 2))
    assert ours.n_output_dims == ref.n_output_dims

    # inject the reference's grids: ref stores [1, C, reso[c1], reso[c0]]
    params = [
        [jnp.asarray(g.detach().numpy()[0]) for g in scale_grids]
        for scale_grids in ref.planes
    ]

    pts = np.random.default_rng(1).uniform(0, 1, (257, 4)).astype(np.float32)
    with torch.no_grad():
        ref_s, ref_d = ref(torch.from_numpy(pts))
    out_s, out_d = ours(params, jnp.asarray(pts))

    np.testing.assert_allclose(np.asarray(out_s), ref_s.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_d), ref_d.numpy(),
                               rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------- UNet
def _bn_from_sd(sd, prefix):
    return (
        {"scale": jnp.asarray(sd[f"{prefix}.weight"].numpy()),
         "bias": jnp.asarray(sd[f"{prefix}.bias"].numpy())},
        {"mean": jnp.asarray(sd[f"{prefix}.running_mean"].numpy()),
         "var": jnp.asarray(sd[f"{prefix}.running_var"].numpy())},
    )


def _double_conv_from_sd(sd, prefix):
    bn1_p, bn1_s = _bn_from_sd(sd, f"{prefix}.0")
    bn2_p, bn2_s = _bn_from_sd(sd, f"{prefix}.4")
    return (
        {"bn1": bn1_p,
         "conv1": jnp.asarray(sd[f"{prefix}.3.weight"].numpy()),
         "bn2": bn2_p,
         "conv2": jnp.asarray(sd[f"{prefix}.7.weight"].numpy())},
        {"bn1": bn1_s, "bn2": bn2_s},
    )


def test_unet_eval_matches_reference(ref_unet_mod):
    from lidar4d_tpu.models.unet import UNet

    torch.manual_seed(0)
    ref = ref_unet_mod.UNet(in_channels=3, channels=32, out_channels=1)
    # randomize BN running stats so eval-mode normalization is non-trivial
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    ref.eval()
    sd = ref.state_dict()

    params, state = {}, {}
    params["inc"] = {"w": jnp.asarray(sd["inc.conv.weight"].numpy()),
                     "b": jnp.asarray(sd["inc.conv.bias"].numpy())}
    for i in range(1, 5):
        p, s = _double_conv_from_sd(sd, f"down{i}.conv.double_conv")
        params[f"down{i}"], state[f"down{i}"] = p, s
        p, s = _double_conv_from_sd(sd, f"up{i}.conv.double_conv")
        params[f"up{i}"], state[f"up{i}"] = p, s
    bn_p, bn_s = _bn_from_sd(sd, "attn.norm")
    params["attn"] = {"bn": bn_p,
                      "qkv": jnp.asarray(sd["attn.proj_qkv.weight"].numpy()),
                      "proj": jnp.asarray(sd["attn.proj.weight"].numpy())}
    state["attn"] = {"bn": bn_s}
    bn_p, bn_s = _bn_from_sd(sd, "outc.conv.0")
    params["outc"] = {"bn": bn_p,
                      "w": jnp.asarray(sd["outc.conv.2.weight"].numpy()),
                      "b": jnp.asarray(sd["outc.conv.2.bias"].numpy())}
    state["outc"] = {"bn": bn_s}

    x = np.random.default_rng(2).uniform(0, 1, (1, 3, 32, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got, _ = UNet(in_channels=3, out_channels=1).apply(
        {"params": params, "state": state}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


# -------------------------------------------------- compositing weights
def test_composite_weights_match_reference_formula():
    """renderer.py:98-104: alphas from deltas+sample_dist, shifted cumprod."""
    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig
    from lidar4d_tpu.models.renderer import _composite_weights

    rng = np.random.default_rng(3)
    n, t = 64, 24
    z_vals = np.sort(rng.uniform(0.01, 0.81, (n, t)).astype(np.float32), axis=1)
    sigma = rng.uniform(0, 50, (n, t)).astype(np.float32)
    sample_dist = (0.81 - 0.01) / t

    for active_sensor, density_scale in [(False, 1.0), (True, 0.7)]:
        zt = torch.from_numpy(z_vals)
        st = torch.from_numpy(sigma)
        deltas = zt[..., 1:] - zt[..., :-1]
        deltas = torch.cat(
            [deltas, sample_dist * torch.ones_like(deltas[..., :1])], dim=-1
        )
        exponent = 2 if active_sensor else 1
        alphas = 1 - torch.exp(-exponent * deltas * density_scale * st)
        alphas_shifted = torch.cat(
            [torch.ones_like(alphas[..., :1]), 1 - alphas + 1e-15], dim=-1
        )
        want = (alphas * torch.cumprod(alphas_shifted, dim=-1)[..., :-1]).numpy()

        cfg = LiDAR4DConfig(active_sensor=active_sensor,
                            density_scale=density_scale)
        got = _composite_weights(cfg, jnp.asarray(sigma), jnp.asarray(z_vals),
                                 sample_dist)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-7)


# ------------------------------------------------------------ ray generator
def test_get_lidar_rays_matches_reference(ref_base_dataset_mod):
    from lidar4d_tpu.ops.rays import get_lidar_rays

    rng = np.random.default_rng(4)
    # a random rigid pose
    q = rng.normal(size=(3, 3)).astype(np.float32)
    r, _ = np.linalg.qr(q)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = r
    pose[:3, 3] = rng.normal(size=3).astype(np.float32) * 0.1

    H, W, intr = 33, 97, (2.0, 26.9)
    ref = ref_base_dataset_mod.get_lidar_rays(
        torch.from_numpy(pose)[None], intr, H, W, N=-1
    )
    ours = get_lidar_rays(jnp.asarray(pose), intr, H, W, N=-1)
    np.testing.assert_allclose(np.asarray(ours["rays_d"]),
                               ref["rays_d"][0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours["rays_o"]),
                               ref["rays_o"][0].numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(ours["inds"]),
                                  ref["inds"][0].numpy())

    # sampled rays must equal the full-frame rays gathered at `inds`
    sampled = get_lidar_rays(jnp.asarray(pose), intr, H, W,
                             key=jax.random.PRNGKey(0), N=64)
    full_d = ref["rays_d"][0].numpy()
    np.testing.assert_allclose(np.asarray(sampled["rays_d"]),
                               full_d[np.asarray(sampled["inds"])],
                               rtol=1e-4, atol=1e-5)

    # patch sampling: indices form px*py patches whose rows stay in range
    patch = get_lidar_rays(jnp.asarray(pose), intr, H, W,
                           key=jax.random.PRNGKey(1), N=64, patch_size=(2, 8))
    inds = np.asarray(patch["inds"]).reshape(-1, 2 * 8)
    rows = inds // W
    assert rows.max() < H
    for blk in rows:
        assert blk.max() - blk.min() == 1  # 2-row patches


# ---------------------------------------------------------------- trunc_exp
def test_trunc_exp_matches_reference(ref_activation_mod):
    from lidar4d_tpu.ops.trunc_exp import trunc_exp

    x = np.array([-30.0, -15.1, -2.0, 0.0, 3.0, 14.9, 20.0], np.float32)

    xt = torch.from_numpy(x).requires_grad_(True)
    yt = ref_activation_mod.trunc_exp(xt)
    yt.backward(torch.ones_like(yt))

    y = trunc_exp(jnp.asarray(x))
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(y), yt.detach().numpy(),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g), xt.grad.numpy(),
                               rtol=1e-5, atol=1e-8)
