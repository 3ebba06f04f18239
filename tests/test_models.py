"""Shape / gradient / semantic tests for the neural field stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar4d_tpu.models import (
    FlowField,
    HashGrid4D,
    LiDAR4DConfig,
    LiDAR4DField,
    Planes4D,
    UNet,
    render_rays,
    render_staged,
)

TINY = LiDAR4DConfig(
    base_resolution=16,
    max_resolution=64,
    log2_hashmap_size=10,
    n_levels_hash=4,
    n_levels_plane=2,
    min_resolution=8,
    time_resolution=4,
    num_frames=5,
    flow_n_levels=4,
    flow_log2_hashmap_size=10,
    flow_base_resolution=8,
    flow_max_resolution=32,
)


@pytest.fixture(scope="module")
def tiny_field():
    field = LiDAR4DField(TINY)
    params = field.init(jax.random.PRNGKey(0))
    return field, params


def test_hashgrid4d_output_dims():
    enc = HashGrid4D()
    assert enc.n_output_dims_static == 32  # 8 levels x 4 feats
    assert enc.n_output_dims_dynamic == 24  # 3 planes x 8
    params = HashGrid4D(
        base_resolution=16, max_resolution=64, log2_hashmap_size=10,
        n_levels=4, hash_size_dynamic=(10, 9, 9), time_resolution=4,
    ).init(jax.random.PRNGKey(0))
    assert params["static"].ndim == 2


def test_hashgrid4d_time_blend_continuity():
    enc = HashGrid4D(
        base_resolution=8, max_resolution=32, log2_hashmap_size=8,
        n_levels=4, time_resolution=4,
    )
    params = enc.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    # continuity across a grid boundary (t = 1/3 is grid index 1)
    eps = 1e-4
    f_lo = enc.forward_dynamic(params, x, 1 / 3 - eps)
    f_hi = enc.forward_dynamic(params, x, 1 / 3 + eps)
    np.testing.assert_allclose(f_lo, f_hi, atol=1e-2)
    # exact grid index uses a single grid
    f_exact = enc.forward_dynamic(params, x, 1 / 3)
    assert np.isfinite(np.asarray(f_exact)).all()


def test_planes4d_dims_and_time_init():
    enc = Planes4D()
    assert enc.n_output_dims == 64  # 8 feats x 4 scales x 2 groups
    params = enc.init(jax.random.PRNGKey(0))
    # 4 scales x 6 planes; time planes (xt, yt, zt at comb ids 2,4,5) are ones
    assert len(params) == 4 and len(params[0]) == 6
    for planes in params:
        for ci, comb in enumerate(
            [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        ):
            if 3 in comb:
                np.testing.assert_array_equal(planes[ci], 1.0)
            else:
                assert planes[ci].min() >= 0.1 and planes[ci].max() <= 0.5

    pts = jax.random.uniform(jax.random.PRNGKey(1), (10, 4))
    s, d = enc(params, pts)
    assert s.shape == (10, 32) and d.shape == (10, 32)
    # with ones-init time planes the dynamic product reduces to spatial-like values
    assert np.isfinite(np.asarray(d)).all()


def test_planes4d_hashed_static_scales():
    """hash_scales=k replaces the top-k scales' STATIC planes with flat
    [2^hash_log2, C] hash tables (PERF.md r4: the dense one-hot bilinear
    costs ~C*H*W MACs/sample — the 256^2 scale dominates planes-static).
    Dims, init range, gradient flow, and dynamic-path invariance."""
    enc = Planes4D(resolution=(32, 32, 32, 8), multiscale_res=(1, 2, 4, 8),
                   hash_scales=2, hash_log2=10)
    assert enc.n_output_dims == 64  # unchanged by hashing
    params = enc.init(jax.random.PRNGKey(0))
    static_ids = [0, 1, 3]  # xy, xz, yz comb indices
    for si, planes in enumerate(params):
        for ci in range(6):
            if ci in static_ids and si >= 2:  # top-2 scales hashed
                assert planes[ci].shape == (1024, 8)
                assert planes[ci].min() >= 0.1 and planes[ci].max() <= 0.5
            elif ci in static_ids:
                assert planes[ci].ndim == 3  # dense low scales
            else:
                np.testing.assert_array_equal(planes[ci], 1.0)  # time planes

    pts = jax.random.uniform(jax.random.PRNGKey(1), (17, 4))
    s, d = enc(params, pts)
    assert s.shape == (17, 32) and d.shape == (17, 32)
    assert np.isfinite(np.asarray(s)).all()

    # dynamic output identical to the all-dense encoder (same init key):
    # hashing touches only static storage
    dense = Planes4D(resolution=(32, 32, 32, 8), multiscale_res=(1, 2, 4, 8))
    dparams = dense.init(jax.random.PRNGKey(0))
    _, d_ref = dense(dparams, pts)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-6)

    # gradient reaches every hashed table
    def loss(p):
        return jnp.sum(enc.forward_static(p, pts) ** 2)

    grads = jax.grad(loss)(params)
    for si in (2, 3):
        for ci in static_ids:
            g = np.asarray(grads[si][ci])
            assert g.shape == (1024, 8) and np.abs(g).sum() > 0


def test_lidar4d_density_with_hashed_planes():
    """End-to-end density + gradient through a field with plane_hash_scales."""
    import dataclasses

    cfg = dataclasses.replace(TINY, plane_hash_scales=1, plane_hash_log2=6)
    field = LiDAR4DField(cfg)
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    out = field.density(params, x, 0.5)
    assert out["sigma"].shape == (32,)
    assert np.isfinite(np.asarray(out["sigma"])).all()

    def loss(p):
        o = field.density(p, x, 0.5)
        return jnp.sum(o["sigma"]) + jnp.sum(o["geo_feat"] ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree.leaves(jax.tree.map(
        lambda g: np.isfinite(np.asarray(g)).all(), grads))
    assert all(flat)


def test_flow_field_near_zero_init():
    ff = FlowField(base_resolution=8, max_resolution=32, log2_hashmap_size=8)
    params = ff.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    flow = ff(params, x, 0.5)
    assert flow.shape == (32, 6)
    assert float(jnp.abs(flow).max()) < 0.05  # N(0, 0.001) head init


def test_density_shapes_and_neighbor_masking(tiny_field):
    field, params = tiny_field
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)
    out = field.density(params, x, 0.5)
    assert out["sigma"].shape == (64,)
    assert out["geo_feat"].shape == (64, TINY.geo_feat_dim)
    assert bool(jnp.all(out["sigma"] >= 0))
    # boundary frames (t=0: no prev; t=1: no next) must still be finite
    for t in (0.0, 1.0, 0.25):
        o = field.density(params, x, t)
        assert np.isfinite(np.asarray(o["sigma"])).all()


def test_density_differentiable(tiny_field):
    field, params = tiny_field
    x = jax.random.uniform(jax.random.PRNGKey(2), (16, 3), minval=-1, maxval=1)

    def loss(p):
        return jnp.sum(field.density(p, x, 0.5)["sigma"])

    g = jax.grad(loss)(params)
    # hash static table must receive gradient
    assert float(jnp.abs(g["hash"]["static"]).sum()) > 0
    # warped hash lookups are stop_gradient'ed, but the direct lookup flows
    assert float(jnp.abs(g["planes"][0][0]).sum()) > 0


def test_attribute_outputs_sigmoid_range(tiny_field):
    field, params = tiny_field
    d = jax.random.normal(jax.random.PRNGKey(3), (32, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    geo = jax.random.normal(jax.random.PRNGKey(4), (32, TINY.geo_feat_dim))
    attr = field.attribute(params, d, geo)
    assert attr.shape == (32, 2)
    assert float(attr.min()) >= 0.0 and float(attr.max()) <= 1.0


def test_flow_interface(tiny_field):
    field, params = tiny_field
    x = jax.random.uniform(jax.random.PRNGKey(5), (8, 3), minval=-1, maxval=1)
    out = field.flow(params, x, 0.3)
    assert out["forward"].shape == (8, 3)
    assert out["backward"].shape == (8, 3)


def test_render_rays_composites(tiny_field):
    field, params = tiny_field
    n = 32
    rays_o = jnp.zeros((n, 3))
    d = jax.random.normal(jax.random.PRNGKey(6), (n, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = render_rays(field, params, rays_o, rays_d, 0.5, num_steps=32)
    assert out["depth_lidar"].shape == (n,)
    assert out["image_lidar"].shape == (n, 2)
    assert out["weights"].shape == (n, 32)
    # weights are a valid transmittance profile
    assert float(out["weights_sum_lidar"].max()) <= 1.0 + 1e-5
    assert float(out["weights"].min()) >= 0.0
    # depth lies in [0, far]
    assert float(out["depth_lidar"].min()) >= 0.0
    assert float(out["depth_lidar"].max()) <= field.cfg.far_lidar + 1e-6


def test_render_rays_perturb_and_grad(tiny_field):
    field, params = tiny_field
    n = 8
    rays_o = jnp.zeros((n, 3))
    rays_d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))

    def loss(p, key):
        out = render_rays(
            field, p, rays_o, rays_d, 0.5, key=key, num_steps=16, perturb=True
        )
        return jnp.sum(out["depth_lidar"]) + jnp.sum(out["image_lidar"])

    g = jax.grad(loss)(params, jax.random.PRNGKey(0))
    flat = jax.tree.leaves(jax.tree.map(lambda a: float(jnp.abs(a).sum()), g))
    assert sum(flat) > 0


def test_render_staged_matches_unstaged(tiny_field):
    field, params = tiny_field
    n = 100  # not a multiple of chunk -> exercises padding
    d = jax.random.normal(jax.random.PRNGKey(7), (n, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.zeros((n, 3))
    full = render_rays(field, params, rays_o, rays_d, 0.5, num_steps=16)
    staged = render_staged(field, params, rays_o, rays_d, 0.5, num_steps=16, chunk=32)
    # bf16 MLP compute fuses differently under lax.map -> ~1e-3 rel noise
    np.testing.assert_allclose(
        staged["depth_lidar"], full["depth_lidar"], rtol=5e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        staged["image_lidar"], full["image_lidar"], rtol=5e-3, atol=1e-4
    )


def test_unet_shapes_and_state_update():
    unet = UNet(in_channels=3, out_channels=1)
    variables = unet.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 66, 128))
    # eval: state unchanged
    y, new_s = unet.apply(variables, x, train=False)
    assert y.shape == (2, 1, 66, 128)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    np.testing.assert_array_equal(
        variables["state"]["down1"]["bn1"]["mean"], new_s["down1"]["bn1"]["mean"]
    )
    # train: running stats move
    y2, new_s2 = unet.apply(variables, x, train=True, key=jax.random.PRNGKey(2))
    assert not np.allclose(
        variables["state"]["down1"]["bn1"]["mean"], new_s2["down1"]["bn1"]["mean"]
    )


def test_unet_differentiable():
    unet = UNet()
    variables = unet.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 32, 64))
    gt = jax.random.uniform(jax.random.PRNGKey(2), (1, 1, 32, 64))

    def loss(p):
        y, _ = unet.apply({"params": p, "state": variables["state"]}, x,
                          train=True, key=jax.random.PRNGKey(3))
        y = jnp.clip(y, 1e-6, 1 - 1e-6)
        return -jnp.mean(gt * jnp.log(y) + (1 - gt) * jnp.log(1 - y))

    g = jax.grad(loss)(variables["params"])
    total = sum(jax.tree.leaves(jax.tree.map(lambda a: float(jnp.abs(a).sum()), g)))
    assert np.isfinite(total) and total > 0


# ------------------------------------------------------- hierarchical sampling
def test_sample_pdf_concentrates_at_peak():
    from lidar4d_tpu.models.renderer import sample_pdf

    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 32), (4, 32))
    w = jnp.zeros((4, 32)).at[:, 16].set(1.0)
    zf = sample_pdf(z, w, 16)
    assert abs(float(zf.mean()) - 16 / 31) < 0.05
    # deterministic without key, jittered with key
    zf2 = sample_pdf(z, w, 16)
    np.testing.assert_array_equal(zf, zf2)
    zf3 = sample_pdf(z, w, 16, key=jax.random.PRNGKey(0))
    assert not np.allclose(zf, zf3)


def test_hierarchical_matches_uniform_render(tiny_field):
    field, params = tiny_field
    ro = jnp.zeros((8, 3))
    rd = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (8, 1))
    t = jnp.float32(0.4)
    out_u = render_rays(field, params, ro, rd, t, num_steps=128)
    out_h = render_rays(field, params, ro, rd, t, num_coarse=32, num_fine=32)
    assert bool(jnp.all(jnp.diff(out_h["z_vals"], axis=-1) >= 0))
    np.testing.assert_allclose(
        out_h["depth_lidar"], out_u["depth_lidar"], rtol=0.05, atol=1e-3
    )
    g = jax.grad(
        lambda p: jnp.sum(
            render_rays(field, p, ro, rd, t, num_coarse=16, num_fine=16)[
                "depth_lidar"
            ]
        )
    )(params)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_hashgrid4d_forward_dynamic_multi_fused_matches_loop():
    """Fused 3-variant dynamic encode (pallas interpret) == the per-variant
    loop fallback, values + variant-0 table gradient; neighbor variants are
    stop-gradiented in both (reference no_grad warped lookups)."""
    enc = HashGrid4D(
        base_resolution=16, max_resolution=64, log2_hashmap_size=9,
        n_levels=4, hash_size_dynamic=(9, 8, 8), time_resolution=4,
    )
    params = enc.init(jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (3, 97, 3))
    ts = jnp.asarray([0.5, 0.52, 0.48], jnp.float32)

    got = enc.forward_dynamic_multi(params, xs, ts, fused=True)
    want = enc.forward_dynamic_multi(params, xs, ts, fused=False)
    assert got.shape == want.shape == (3, 97, enc.n_output_dims_dynamic)
    scale = max(float(jnp.abs(want).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale,
                               rtol=3e-2, atol=3e-2)

    def loss(p, fused):
        out = enc.forward_dynamic_multi(p, xs, ts, fused=fused)
        return jnp.sum(out ** 2)

    g_f = jax.grad(lambda p: loss(p, True))(params)
    g_l = jax.grad(lambda p: loss(p, False))(params)
    for key in g_f:
        a, b = np.asarray(g_f[key]), np.asarray(g_l[key])
        s = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / s, b / s, rtol=5e-2, atol=5e-2)


def test_sample_pdf_onehot_lookup_matches_gather():
    """The one-hot contraction lookups inside sample_pdf are bitwise-identical
    to the take_along_axis formulation they replaced (PERF.md r3)."""
    from lidar4d_tpu.models.renderer import sample_pdf

    key = jax.random.PRNGKey(7)
    n, c, s = 16, 33, 57
    z = jnp.sort(jax.random.uniform(key, (n, c), minval=0.1, maxval=0.9), axis=-1)
    w = jax.random.uniform(jax.random.PRNGKey(8), (n, c)) ** 4

    def sample_pdf_gather(z_mid, weights, n_samples, key=None):
        nn, cc = weights.shape
        pdf = weights + 1e-5
        pdf = pdf / jnp.sum(pdf, axis=-1, keepdims=True)
        cdf = jnp.cumsum(pdf, axis=-1)
        cdf = jnp.concatenate([jnp.zeros((nn, 1), cdf.dtype), cdf], axis=-1)
        u = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples
        u = jnp.broadcast_to(u, (nn, n_samples))
        if key is not None:
            u = u + (jax.random.uniform(key, (nn, n_samples)) - 0.5) / n_samples
            u = jnp.clip(u, 1e-6, 1.0 - 1e-6)
        below = jnp.sum(u[:, :, None] >= cdf[:, None, :], axis=-1) - 1
        below = jnp.clip(below, 0, cc - 1)
        cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
        cdf_hi = jnp.take_along_axis(cdf, below + 1, axis=-1)
        z_lo = jnp.take_along_axis(z_mid, below, axis=-1)
        z_hi = jnp.take_along_axis(z_mid, jnp.clip(below + 1, 0, cc - 1), axis=-1)
        denom = jnp.maximum(cdf_hi - cdf_lo, 1e-8)
        frac = (u - cdf_lo) / denom
        return z_lo + frac * (z_hi - z_lo)

    for k in [None, jax.random.PRNGKey(3)]:
        np.testing.assert_array_equal(
            np.asarray(sample_pdf(z, w, s, key=k)),
            np.asarray(sample_pdf_gather(z, w, s, key=k)),
        )
    # degenerate: one-hot weights (near-empty cdf intervals)
    w1 = jnp.zeros((n, c)).at[:, 5].set(1.0)
    np.testing.assert_array_equal(
        np.asarray(sample_pdf(z, w1, s)), np.asarray(sample_pdf_gather(z, w1, s))
    )


def test_merge_sorted_matches_stable_argsort():
    """merge_sorted == stable argsort of the concatenation, bitwise, for z
    and co-sorted values — including ties within and across the inputs."""
    from lidar4d_tpu.models.renderer import merge_sorted

    key = jax.random.PRNGKey(11)
    n, a, b, f = 8, 13, 21, 5
    # quantize to force plenty of exact ties
    za = jnp.sort(
        jnp.round(jax.random.uniform(key, (n, a)) * 16) / 16, axis=-1
    )
    zb = jnp.sort(
        jnp.round(jax.random.uniform(jax.random.PRNGKey(12), (n, b)) * 16) / 16,
        axis=-1,
    )
    sig = jax.random.normal(jax.random.PRNGKey(13), (n, a + b))
    geo = jax.random.normal(jax.random.PRNGKey(14), (n, a + b, f))

    z_all = jnp.concatenate([za, zb], axis=-1)
    order = jnp.argsort(z_all, axis=-1, stable=True)
    want_z = jnp.take_along_axis(z_all, order, axis=-1)
    want_sig = jnp.take_along_axis(sig, order, axis=-1)
    want_geo = jnp.take_along_axis(geo, order[..., None], axis=1)

    got_z, (got_sig, got_geo) = merge_sorted(za, zb, [sig, geo])
    np.testing.assert_array_equal(np.asarray(got_z), np.asarray(want_z))
    np.testing.assert_array_equal(np.asarray(got_sig), np.asarray(want_sig))
    np.testing.assert_array_equal(np.asarray(got_geo), np.asarray(want_geo))


def test_merge_sorted_fallback_matches_onehot(monkeypatch):
    """The large-N argsort fallback and the one-hot path agree bitwise."""
    import lidar4d_tpu.models.renderer as R

    key = jax.random.PRNGKey(21)
    n, a, b, f = 4, 9, 15, 3
    za = jnp.sort(jnp.round(jax.random.uniform(key, (n, a)) * 8) / 8, axis=-1)
    zb = jnp.sort(
        jnp.round(jax.random.uniform(jax.random.PRNGKey(22), (n, b)) * 8) / 8,
        axis=-1,
    )
    sig = jax.random.normal(jax.random.PRNGKey(23), (n, a + b))
    geo = jax.random.normal(jax.random.PRNGKey(24), (n, a + b, f))

    z1, (s1, g1) = R.merge_sorted(za, zb, [sig, geo])
    monkeypatch.setattr(R, "_MERGE_ONEHOT_MAX_ELEMS", 0)
    z2, (s2, g2) = R.merge_sorted(za, zb, [sig, geo])
    np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_render_staged_host_matches_staged(tiny_field):
    """The host chunk-loop renderer (gather-path eval/sim after the r3
    lax.map TPU-worker fault, see render_staged_host) must reproduce the
    compiled render_staged composite exactly — same chunking, same padding,
    same per-chunk graph."""
    from lidar4d_tpu.models.renderer import render_staged_host

    field, params = tiny_field
    key = jax.random.PRNGKey(3)
    ro = jax.random.uniform(key, (50, 3), minval=-0.2, maxval=0.2)
    rd = jax.random.normal(jax.random.PRNGKey(4), (50, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    t = jnp.float32(0.25)

    a = render_staged(field, params, ro, rd, t, num_steps=16, chunk=16)
    b = render_staged_host(field, params, ro, rd, t, num_steps=16, chunk=16)
    np.testing.assert_allclose(np.asarray(a["depth_lidar"]),
                               np.asarray(b["depth_lidar"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a["image_lidar"]),
                               np.asarray(b["image_lidar"]), rtol=1e-6)

    # hierarchical sampling path too (uses sample_pdf + merge per chunk)
    a = render_staged(field, params, ro, rd, t, chunk=16, num_coarse=8,
                      num_fine=8)
    b = render_staged_host(field, params, ro, rd, t, chunk=16, num_coarse=8,
                           num_fine=8)
    np.testing.assert_allclose(np.asarray(a["depth_lidar"]),
                               np.asarray(b["depth_lidar"]), rtol=1e-6)
