"""Golden-value tests for the numeric core against reference semantics.

Where the reference math is torch (grid_sample) we test against torch CPU;
where it is a Python loop (pano z-buffer) we test against a literal
reimplementation of the loop; pure formulas (rays, lagrange) get closed-form
goldens.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar4d_tpu.ops import (
    trunc_exp,
    grid_sample_2d,
    chamfer_distance,
    lidar_to_pano_with_intensities,
    pano_to_lidar_with_intensities,
    pano_to_lidar,
    get_lidar_rays,
    init_mlp,
    apply_mlp,
)
from lidar4d_tpu.ops.hash_enc import (
    HashEncoderSpec,
    hash_encode,
    init_hash_table,
    lagrange_time_interp,
)


# ---------------------------------------------------------------- trunc_exp
def test_trunc_exp_forward_backward():
    x = jnp.array([-20.0, -1.0, 0.0, 3.0, 20.0])
    np.testing.assert_allclose(trunc_exp(x), np.exp(x), rtol=1e-5)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    expected = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(g, expected, rtol=1e-5)


# ---------------------------------------------------------------- grid sample
def test_grid_sample_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    C, H, W, N = 8, 13, 17, 200
    grid = rng.normal(size=(C, H, W)).astype(np.float32)
    coords01 = rng.uniform(0, 1, size=(N, 2)).astype(np.float32)
    # include exact corners/edges
    coords01[:4] = [[0, 0], [1, 1], [0, 1], [1, 0]]

    ours = np.asarray(grid_sample_2d(jnp.asarray(grid), jnp.asarray(coords01)))

    # reference path: planes_field.py grid_sample_wrapper
    t_grid = torch.from_numpy(grid)[None]  # [1, C, H, W]
    t_coords = torch.from_numpy(coords01 * 2.0 - 1.0)[None, None]  # [1,1,N,2]
    ref = F.grid_sample(
        t_grid, t_coords, align_corners=True, mode="bilinear", padding_mode="border"
    )  # [1, C, 1, N]
    ref = ref[0, :, 0, :].T.numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- hash encoder
def test_hash_encoder_shapes_and_determinism():
    spec = HashEncoderSpec(
        n_dims=3, n_levels=4, n_features=2, log2_hashmap_size=12,
        base_resolution=16, max_resolution=128,
    )
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    out = hash_encode(spec, table, x)
    assert out.shape == (64, spec.n_output_dims)
    out2 = hash_encode(spec, table, x)
    np.testing.assert_array_equal(out, out2)


def test_hash_encoder_dense_level_exact_interp():
    # a dense level should reproduce exact bilinear interpolation of vertices
    spec = HashEncoderSpec(
        n_dims=2, n_levels=1, n_features=1, log2_hashmap_size=16,
        base_resolution=4, max_resolution=4,
    )
    assert spec.table_sizes[0] == 25  # (4+1)^2 dense
    # table value = x + 10*y on the vertex grid
    vals = np.zeros((25, 1), np.float32)
    for yy in range(5):
        for xx in range(5):
            vals[xx + yy * 5] = xx + 10 * yy
    x = jnp.array([[0.5, 0.5], [0.25, 0.75], [1.0, 1.0], [0.0, 0.0]])
    out = np.asarray(hash_encode(spec, jnp.asarray(vals), x))[:, 0]
    # position in vertex units = coord * res
    expected = np.array([2 + 10 * 2, 1 + 10 * 3, 4 + 10 * 4, 0.0])
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_hash_encoder_row_offset_selects_grid():
    spec = HashEncoderSpec(
        n_dims=2, n_levels=2, n_features=2, log2_hashmap_size=8,
        base_resolution=8, max_resolution=16,
    )
    k = jax.random.PRNGKey(0)
    table = init_hash_table(k, spec, n_grids=3)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 2))
    out0 = hash_encode(spec, table, x, row_offset=jnp.int32(0))
    out1 = hash_encode(spec, table, x, row_offset=jnp.int32(spec.n_rows))
    ref1 = hash_encode(spec, table[spec.n_rows: 2 * spec.n_rows], x)
    assert not np.allclose(out0, out1)
    np.testing.assert_allclose(out1, ref1, rtol=1e-6)


def test_lagrange_interp_matches_reference_formula():
    """Golden vs the reference interpT (hash_field.py:65-74) in numpy."""
    rng = np.random.default_rng(0)
    N, L, F, B = 7, 8, 4, 4
    feats = rng.normal(size=(N, L * F)).astype(np.float32)
    t = 0.37

    # reference formula
    x = feats.reshape(N, L, F)
    chunks = np.split(x, B, axis=-1)
    T = [i / (B - 1) for i in range(B)]

    def basis(j):
        out = 1.0
        for m in range(B):
            if m != j:
                out *= (t - T[m]) / (T[j] - T[m])
        return out

    ref = sum(basis(i) * chunks[i] for i in range(B)).reshape(N, L * F // B)

    ours = np.asarray(lagrange_time_interp(jnp.asarray(feats), t, L, F, B))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------- chamfer
def _brute_chamfer(x, y):
    d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return d.min(1), d.min(0), d.argmin(1), d.argmin(0)


def test_chamfer_matches_bruteforce():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 300, 3)).astype(np.float32)
    y = rng.normal(size=(2, 457, 3)).astype(np.float32)
    d1, d2, i1, i2 = chamfer_distance(jnp.asarray(x), jnp.asarray(y))
    for b in range(2):
        rd1, rd2, ri1, ri2 = _brute_chamfer(x[b], y[b])
        np.testing.assert_allclose(d1[b], rd1, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(d2[b], rd2, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(i1[b], ri1)
        np.testing.assert_array_equal(i2[b], ri2)


def test_chamfer_gradient_matches_reference_semantics():
    """VJP must equal the CUDA backward's analytic scatter (chamfer3D.cu:154-173)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 40, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 55, 3)).astype(np.float32))

    def loss(x, y):
        d1, d2, _, _ = chamfer_distance(x, y)
        return jnp.sum(d1) * 1.3 + jnp.sum(d2) * 0.7

    gx, gy = jax.grad(loss, argnums=(0, 1))(x, y)

    # analytic
    d1, d2, i1, i2 = map(np.asarray, chamfer_distance(x, y))
    xn, yn = np.asarray(x)[0], np.asarray(y)[0]
    egx = 1.3 * 2 * (xn - yn[i1[0]])
    egy = 0.7 * 2 * (yn - xn[i2[0]])
    for i, j in enumerate(i1[0]):
        egy[j] -= 1.3 * 2 * (xn[i] - yn[j])
    for j, i in enumerate(i2[0]):
        egx[i] -= 0.7 * 2 * (yn[j] - xn[i])
    np.testing.assert_allclose(gx[0], egx, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gy[0], egy, rtol=1e-4, atol=1e-5)


def test_chamfer_grad_numerical():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 12, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(1, 9, 3)).astype(np.float32))

    def loss(x):
        d1, d2, _, _ = chamfer_distance(x, y)
        return jnp.sum(d1) + jnp.sum(d2)

    g = jax.grad(loss)(x)
    eps = 1e-3
    for idx in [(0, 0, 0), (0, 5, 1), (0, 11, 2)]:
        xp = x.at[idx].add(eps)
        xm = x.at[idx].add(-eps)
        fd = (loss(xp) - loss(xm)) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-3)


# ---------------------------------------------------------------- pano
def _reference_lidar_to_pano(pts, H, W, K, max_depth=80.0):
    """Literal reimplementation of convert.py:4-65 (loop) as golden."""
    xyz, intens = pts[:, :3], pts[:, 3]
    fov_up, fov = K
    fov_down = fov - fov_up
    dists = np.linalg.norm(xyz, axis=1)
    pano = np.zeros((H, W))
    ivals = np.zeros((H, W))
    for p, dist, inten in zip(xyz, dists, intens):
        if dist >= max_depth:
            continue
        x, y, z = p
        beta = np.pi - np.arctan2(y, x)
        alpha = np.arctan2(z, np.sqrt(x**2 + y**2)) + fov_down / 180 * np.pi
        c = int(round(beta / (2 * np.pi / W)))
        r = int(round(H - alpha / (fov / 180 * np.pi / H)))
        if r >= H or r < 0 or c >= W or c < 0:
            continue
        if pano[r, c] == 0.0 or pano[r, c] > dist:
            pano[r, c] = dist
            ivals[r, c] = inten
    return pano, ivals


def test_lidar_to_pano_matches_reference_loop():
    rng = np.random.default_rng(0)
    n = 4000
    pts = np.zeros((n, 4), np.float32)
    r = rng.uniform(2, 70, n)
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(np.radians(-24.9), np.radians(2.0), n)
    pts[:, 0] = r * np.cos(el) * np.cos(az)
    pts[:, 1] = r * np.cos(el) * np.sin(az)
    pts[:, 2] = r * np.sin(el)
    pts[:, 3] = rng.uniform(0, 1, n)
    H, W, K = 22, 103, (2.0, 26.9)

    pano, intens = lidar_to_pano_with_intensities(pts, H, W, K)
    ref_pano, ref_intens = _reference_lidar_to_pano(pts, H, W, K)
    np.testing.assert_allclose(pano, ref_pano, rtol=1e-6)
    np.testing.assert_allclose(intens, ref_intens, rtol=1e-6)


def test_pano_lidar_roundtrip():
    # back-projecting a pano and re-projecting must reproduce it
    rng = np.random.default_rng(1)
    H, W, K = 16, 64, (2.0, 26.9)
    pano = rng.uniform(3, 60, size=(H, W))
    pano[rng.uniform(size=(H, W)) < 0.3] = 0.0
    intens = rng.uniform(size=(H, W)) * (pano > 0)
    pts = pano_to_lidar_with_intensities(pano, intens, K)
    assert pts.shape[1] == 4
    pano2, intens2 = lidar_to_pano_with_intensities(pts, H, W, K)
    # column 0 sits on the azimuth seam: beta = pi back-projects to
    # arctan2(-eps, -1) and re-projects to c = W (dropped) — the reference
    # loop drops those points identically, so the roundtrip holds for c >= 1.
    np.testing.assert_allclose(pano2[:, 1:], pano[:, 1:], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(intens2[:, 1:], intens[:, 1:], rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------- rays
def test_full_image_rays_match_pano_backprojection():
    """Rays o + d*depth must reconstruct pano_to_lidar points (world frame)."""
    K = (2.0, 26.9)
    H, W = 8, 32
    pose = np.eye(4, dtype=np.float32)
    rays = get_lidar_rays(jnp.asarray(pose), K, H, W, N=-1)
    rng = np.random.default_rng(0)
    pano = rng.uniform(5, 50, size=(H, W)).astype(np.float32)
    pts_ref = pano_to_lidar(pano, K)  # all pixels nonzero -> H*W points
    pts_rays = np.asarray(rays["rays_d"]) * pano.reshape(-1, 1)
    np.testing.assert_allclose(pts_rays, pts_ref, rtol=1e-4, atol=1e-5)


def test_ray_sampling_shapes_and_bounds():
    K = (2.0, 26.9)
    H, W = 66, 1030
    pose = jnp.eye(4)
    out = get_lidar_rays(pose, K, H, W, key=jax.random.PRNGKey(0), N=1024)
    assert out["rays_o"].shape == (1024, 3)
    assert out["inds"].shape == (1024,)
    assert int(out["inds"].max()) < H * W

    out = get_lidar_rays(
        pose, K, H, W, key=jax.random.PRNGKey(1), N=1024, patch_size=[2, 8]
    )
    assert out["rays_d"].shape == (1024, 3)
    # patch rows stay in range
    rows = np.asarray(out["inds"]) // W
    assert rows.max() < H


def test_rays_rotated_by_pose():
    K = (2.0, 26.9)
    H, W = 4, 16
    theta = 0.3
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.array(
        [[np.cos(theta), -np.sin(theta), 0],
         [np.sin(theta), np.cos(theta), 0],
         [0, 0, 1]], np.float32)
    pose[:3, 3] = [1.0, 2.0, 3.0]
    out = get_lidar_rays(jnp.asarray(pose), K, H, W, N=-1)
    base = get_lidar_rays(jnp.eye(4), K, H, W, N=-1)
    np.testing.assert_allclose(
        np.asarray(out["rays_d"]),
        np.asarray(base["rays_d"]) @ pose[:3, :3].T,
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(out["rays_o"])[0], pose[:3, 3])


# ---------------------------------------------------------------- mlp
def test_mlp_shapes_and_grad():
    params = init_mlp(jax.random.PRNGKey(0), [16, 64, 64, 6], final_init_std=0.001)
    assert [p.shape for p in params] == [(16, 64), (64, 64), (64, 6)]
    assert float(jnp.abs(params[-1]).max()) < 0.01
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    y = apply_mlp(params, x)
    assert y.shape == (32, 6) and y.dtype == jnp.float32
    g = jax.grad(lambda p: jnp.sum(apply_mlp(p, x) ** 2))(params)
    assert all(gi.shape == pi.shape for gi, pi in zip(g, params))


# ------------------------------------------------------- one-hot MXU encoder
def test_hash_encode_onehot_matches_gather():
    """Pallas one-hot path (interpret mode on CPU) vs the XLA gather path."""
    from lidar4d_tpu.ops.hash_onehot import hash_encode_onehot, onehot_eligible

    spec = HashEncoderSpec(
        n_dims=3, n_levels=4, n_features=8, log2_hashmap_size=10,
        base_resolution=8, max_resolution=64,
    )
    assert onehot_eligible(spec)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 3))
    ref = np.asarray(hash_encode(spec, table, x))
    out = np.asarray(hash_encode_onehot(spec, table, x))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=2e-2 * scale)

    # table gradient matches the gather path's (bf16 matmul tolerance)
    w = jnp.sin(jnp.arange(ref.size).reshape(ref.shape) * 0.37)
    g_oh = jax.grad(lambda t: jnp.sum(hash_encode_onehot(spec, t, x) * w))(table)
    g_ref = jax.grad(lambda t: jnp.sum(hash_encode(spec, t, x) * w))(table)
    gscale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(g_oh), np.asarray(g_ref),
                               atol=2e-2 * gscale)


def test_hash_encode_onehot_fact_matches_gather():
    """Factorized (hi/lo row split) one-hot kernel vs the XLA gather path,
    forward and table gradient, 2D and 3D, dense and hashed levels."""
    from lidar4d_tpu.ops.hash_onehot import hash_encode_onehot_fact

    for spec in (
        HashEncoderSpec(n_dims=3, n_levels=4, n_features=8,
                        log2_hashmap_size=10, base_resolution=8,
                        max_resolution=64),
        HashEncoderSpec(n_dims=2, n_levels=3, n_features=4,
                        log2_hashmap_size=9, base_resolution=16,
                        max_resolution=128),
    ):
        table = init_hash_table(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (300, spec.n_dims))
        ref = np.asarray(hash_encode(spec, table, x))
        out = np.asarray(hash_encode_onehot_fact(spec, table, x))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out, ref, atol=2e-2 * scale)

        w = jnp.sin(jnp.arange(ref.size).reshape(ref.shape) * 0.37)
        g_oh = jax.grad(
            lambda t: jnp.sum(hash_encode_onehot_fact(spec, t, x) * w)
        )(table)
        g_ref = jax.grad(lambda t: jnp.sum(hash_encode(spec, t, x) * w))(table)
        gscale = float(jnp.abs(g_ref).max())
        np.testing.assert_allclose(np.asarray(g_oh), np.asarray(g_ref),
                                   atol=2e-2 * gscale)


def test_onehot_coord_grad_trap_is_loud():
    """The one-hot kernels never compute d/dx; a caller that differentiates
    through the coordinates must get a LOUD NaN, not silent zeros — while the
    supported paths (coords from non-learned inputs or under stop_gradient)
    stay finite. Guards the trap flagged in VERDICT r2 (ops/hash_onehot.py
    coordinate cotangent)."""
    from lidar4d_tpu.ops.hash_onehot import hash_encode_onehot_fact

    spec = HashEncoderSpec(
        n_dims=2, n_levels=2, n_features=4, log2_hashmap_size=9,
        base_resolution=8, max_resolution=16,
    )
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))

    # differentiating through the coordinates -> NaN (loud failure)
    shift = jnp.zeros((2,))
    g_bad = jax.grad(
        lambda s: jnp.sum(hash_encode_onehot_fact(spec, table, x + s))
    )(shift)
    assert np.all(np.isnan(np.asarray(g_bad)))

    # the supported path — stop_gradient'ed coords, table grads live — stays
    # finite even though x is a function of the differentiated shift
    g_ok = jax.grad(
        lambda t, s: jnp.sum(
            hash_encode_onehot_fact(spec, t, jax.lax.stop_gradient(x + s))
        ),
        argnums=0,
    )(table, shift)
    assert np.all(np.isfinite(np.asarray(g_ok)))


def test_hash_encode_auto_coord_grad_forces_gather():
    """hash_encode_auto(coord_grad=True) must route to the differentiable
    gather path (finite, correct d/dx) even for one-hot-eligible tables."""
    from lidar4d_tpu.ops.hash_onehot import hash_encode_auto

    spec = HashEncoderSpec(
        n_dims=2, n_levels=2, n_features=4, log2_hashmap_size=9,
        base_resolution=8, max_resolution=16,
    )
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2), minval=0.1,
                           maxval=0.9)
    g = jax.grad(
        lambda xx: jnp.sum(hash_encode_auto(spec, table, xx, coord_grad=True))
    )(x)
    assert np.all(np.isfinite(np.asarray(g)))
    # finite-difference sanity on one coordinate
    e = 1e-3
    f = lambda xx: float(jnp.sum(hash_encode_auto(spec, table, xx,  # noqa: E731
                                                  coord_grad=True)))
    dx = jnp.zeros_like(x).at[0, 0].set(e)
    fd = (f(x + dx) - f(x - dx)) / (2 * e)
    np.testing.assert_allclose(float(g[0, 0]), fd, rtol=0.1, atol=1e-3)


def test_points_meter_bucketed_padding_parity():
    """PointsMeter pads clouds to 8192-buckets with a 1e6 sentinel (static
    chamfer shapes, no per-frame recompile); CD/F must equal the unpadded
    computation exactly."""
    from lidar4d_tpu.eval.meters import PointsMeter, fscore
    from lidar4d_tpu.ops.chamfer import chamfer_distance
    from lidar4d_tpu.ops.pano import pano_to_lidar

    rng = np.random.default_rng(1)
    H, W, scale = 8, 64, 0.01
    depth = (rng.random((H, W)) * 0.5 + 0.1).astype(np.float32)
    depth[rng.random((H, W)) < 0.2] = 0.0
    gt = depth.copy()
    gt[rng.random((H, W)) < 0.1] = 0.0

    m = PointsMeter(scale=scale, intrinsics=(2.0, 26.9))
    m.update(depth[None], gt[None])
    cd_b, f_b = m.measure()

    p = pano_to_lidar(depth / scale, (2.0, 26.9)).astype(np.float32)
    g = pano_to_lidar(gt / scale, (2.0, 26.9)).astype(np.float32)
    d1, d2, _, _ = chamfer_distance(jnp.asarray(p)[None], jnp.asarray(g)[None])
    cd_ref = float(np.asarray(d1).mean() + np.asarray(d2).mean())
    f_ref, _, _ = fscore(np.asarray(d1), np.asarray(d2), threshold=0.05)
    np.testing.assert_allclose(cd_b, cd_ref, rtol=1e-5)
    np.testing.assert_allclose(f_b, float(f_ref[0]), atol=1e-9)


def test_hash_encode_fact_multi_matches_single():
    """Fused V-variant factorized encode == per-variant single encodes;
    variant-0 table grad matches the single kernel's, neighbor tables get
    exactly zero grad (the reference's no_grad warped lookups), and
    stop-gradiented neighbor outputs keep the coord poison gated off."""
    from lidar4d_tpu.ops.hash_onehot import (
        hash_encode_fact_multi,
        hash_encode_onehot_fact,
    )

    spec = HashEncoderSpec(
        n_dims=2, n_levels=3, n_features=4, log2_hashmap_size=9,
        base_resolution=16, max_resolution=128,
    )
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    tab0 = init_hash_table(k[0], spec)
    tabs_ng = jnp.stack([init_hash_table(k[1], spec),
                         init_hash_table(k[2], spec)])
    xs = jax.random.uniform(k[3], (3, 300, 2))

    out = hash_encode_fact_multi(spec, tab0, tabs_ng, xs)
    for v in range(3):
        tab = tab0 if v == 0 else tabs_ng[v - 1]
        want = hash_encode_onehot_fact(spec, tab, xs[v])
        np.testing.assert_allclose(np.asarray(out[v]), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

    w = jnp.sin(jnp.arange(out[0].size).reshape(out[0].shape) * 0.37)

    def loss_multi(t, tng):
        o = hash_encode_fact_multi(spec, t, tng, xs)
        # neighbor variants consumed under stop_gradient, like density()
        return jnp.sum(o[0] * w) + jnp.sum(jax.lax.stop_gradient(o[1:]))

    g0, gng = jax.grad(loss_multi, argnums=(0, 1))(tab0, tabs_ng)
    g_ref = jax.grad(
        lambda t: jnp.sum(hash_encode_onehot_fact(spec, t, xs[0]) * w)
    )(tab0)
    gscale = float(jnp.abs(g_ref).max())
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g_ref),
                               atol=2e-2 * gscale)
    assert float(jnp.abs(gng).max()) == 0.0

    # warped coords feed a learned shift: with neighbor outputs
    # stop-gradiented the flow-like path must stay finite (poison off)
    def loss_shift(s):
        o = hash_encode_fact_multi(
            spec, tab0, tabs_ng,
            jnp.stack([xs[0], xs[1] + s, xs[2] + s]),
        )
        return jnp.sum(o[0] * w) + jnp.sum(jax.lax.stop_gradient(o[1:]))

    gs = jax.grad(loss_shift)(jnp.zeros((2,)))
    assert np.all(np.isfinite(np.asarray(gs)))

    # but consuming a neighbor output WITHOUT stop_gradient while
    # differentiating its coords is the coord-grad trap: loud NaN
    g_bad = jax.grad(
        lambda s: jnp.sum(
            hash_encode_fact_multi(
                spec, tab0, tabs_ng, jnp.stack([xs[0], xs[1] + s, xs[2]])
            )[1]
        )
    )(jnp.zeros((2,)))
    assert np.all(np.isnan(np.asarray(g_bad)))


def test_hash_encode_folded_matches_interp_of_gather():
    """interpT-folded one-hot encode == lagrange_time_interp(gather encode),
    values + table gradient (the fold is a reassociation of the same linear
    contraction; bf16 kernel tolerance). Covers 2D (dyn planes) and 3D
    (flow grid) specs, including F' = 1."""
    from lidar4d_tpu.ops.hash_enc import lagrange_time_interp, lagrange_weights
    from lidar4d_tpu.ops.hash_onehot import hash_encode_folded

    for spec, nb in (
        (HashEncoderSpec(n_dims=3, n_levels=4, n_features=8,
                         log2_hashmap_size=10, base_resolution=8,
                         max_resolution=64), 4),
        (HashEncoderSpec(n_dims=2, n_levels=3, n_features=4,
                         log2_hashmap_size=9, base_resolution=16,
                         max_resolution=128), 4),
    ):
        table = init_hash_table(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (300, spec.n_dims))
        t = jnp.float32(0.37)
        w = lagrange_weights(t, nb)

        ref = lagrange_time_interp(
            hash_encode(spec, table, x), t, spec.n_levels, spec.n_features, nb
        )
        out = hash_encode_folded(spec, table, x, w)
        assert out.shape == ref.shape
        scale = max(float(jnp.abs(ref).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(out) / scale,
                                   np.asarray(ref) / scale,
                                   rtol=2e-2, atol=2e-2)

        cw = jnp.sin(jnp.arange(ref.size).reshape(ref.shape) * 0.37)
        g_f = jax.grad(
            lambda tb: jnp.sum(hash_encode_folded(spec, tb, x, w) * cw)
        )(table)
        g_ref = jax.grad(
            lambda tb: jnp.sum(
                lagrange_time_interp(
                    hash_encode(spec, tb, x), t, spec.n_levels,
                    spec.n_features, nb,
                ) * cw
            )
        )(table)
        gscale = max(float(jnp.abs(g_ref).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(g_f) / gscale,
                                   np.asarray(g_ref) / gscale,
                                   rtol=2e-2, atol=2e-2)


def test_hash_encode_folded_poisons_coord_and_weight_grads():
    """The folded kernel must NaN-poison both the coordinate AND the
    Lagrange-weight (time) cotangents — neither is computed, and t is never
    legitimately differentiated in this framework."""
    from lidar4d_tpu.ops.hash_enc import lagrange_weights
    from lidar4d_tpu.ops.hash_onehot import hash_encode_folded

    spec = HashEncoderSpec(n_dims=2, n_levels=2, n_features=4,
                           log2_hashmap_size=9, base_resolution=8,
                           max_resolution=16)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))

    g_x = jax.grad(
        lambda s: jnp.sum(hash_encode_folded(
            spec, table, x + s, lagrange_weights(jnp.float32(0.4), 4)))
    )(jnp.zeros((2,)))
    assert np.all(np.isnan(np.asarray(g_x)))

    g_t = jax.grad(
        lambda t: jnp.sum(hash_encode_folded(
            spec, table, x, lagrange_weights(t, 4)))
    )(jnp.float32(0.4))
    assert np.isnan(float(g_t))

    g_tab = jax.grad(
        lambda tb: jnp.sum(hash_encode_folded(
            spec, tb, x, lagrange_weights(jnp.float32(0.4), 4)))
    )(table)
    assert np.all(np.isfinite(np.asarray(g_tab)))


def test_hash_encode_fact_multi_folded_matches_single():
    """Fused V-variant folded encode == per-variant hash_encode_folded;
    variant-0 table grad only, neighbor tables exactly zero grad."""
    from lidar4d_tpu.ops.hash_enc import lagrange_weights
    from lidar4d_tpu.ops.hash_onehot import (
        hash_encode_fact_multi_folded,
        hash_encode_folded,
    )

    spec = HashEncoderSpec(
        n_dims=2, n_levels=3, n_features=4, log2_hashmap_size=9,
        base_resolution=16, max_resolution=128,
    )
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    tab0 = init_hash_table(k[0], spec)
    tabs_ng = jnp.stack([init_hash_table(k[1], spec),
                         init_hash_table(k[2], spec)])
    xs = jax.random.uniform(k[3], (3, 300, 2))
    ws = lagrange_weights(jnp.asarray([0.5, 0.52, 0.48]), 4)  # [3, 4]

    out = hash_encode_fact_multi_folded(spec, tab0, tabs_ng, xs, ws)
    for v in range(3):
        tab = tab0 if v == 0 else tabs_ng[v - 1]
        want = hash_encode_folded(spec, tab, xs[v], ws[v])
        np.testing.assert_allclose(np.asarray(out[v]), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

    cw = jnp.sin(jnp.arange(out[0].size).reshape(out[0].shape) * 0.37)

    def loss_multi(t, tng):
        o = hash_encode_fact_multi_folded(spec, t, tng, xs, ws)
        return jnp.sum(o[0] * cw) + jnp.sum(jax.lax.stop_gradient(o[1:]))

    g0, gng = jax.grad(loss_multi, argnums=(0, 1))(tab0, tabs_ng)
    g_ref = jax.grad(
        lambda t: jnp.sum(hash_encode_folded(spec, t, xs[0], ws[0]) * cw)
    )(tab0)
    gscale = max(float(jnp.abs(g_ref).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(g0) / gscale,
                               np.asarray(g_ref) / gscale,
                               rtol=2e-2, atol=2e-2)
    assert float(jnp.abs(gng).max()) == 0.0
    assert np.all(np.isfinite(np.asarray(g0)))
