"""plane_bilinear (factorized one-hot MXU kernel) vs the XLA gather path.

The kernel runs in pallas interpret mode on CPU, so forward and both
gradients (table + coordinates) are checkable without a TPU. Tolerances are
bf16-matmul sized (~1e-2 relative): the kernel casts one-hot weights and
table values to bf16 for the MXU, the gather path stays f32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar4d_tpu.ops.plane_onehot import plane_bilinear, plane_bilinear_ref


def _case(p=3, c=8, h=16, w=24, n=173, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    grid = jax.random.normal(k1, (p, c, h, w), jnp.float32)
    # include out-of-range coords to exercise the border clamp
    pts = jax.random.uniform(k2, (p, n, 2), jnp.float32, -0.2, 1.2)
    return grid, pts


def test_forward_matches_gather_path():
    grid, pts = _case()
    out = plane_bilinear(grid, pts)
    ref = plane_bilinear_ref(grid, pts)
    assert out.shape == ref.shape == (3, 8, 173)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_forward_exact_grid_points():
    # at exact grid vertices the interpolation weights are {0, 1}: bf16
    # cannot perturb them, so values must equal the bf16-quantized table
    grid, _ = _case(h=8, w=128)  # tile-aligned: no padding path
    p, c, h, w = grid.shape
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    pts = jnp.stack(
        [xs.reshape(-1) / (w - 1), ys.reshape(-1) / (h - 1)], axis=-1
    )[None].repeat(p, 0)
    out = plane_bilinear(grid, pts.astype(jnp.float32))
    want = grid.astype(jnp.bfloat16).astype(jnp.float32).reshape(p, c, h * w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("shape", [(16, 24), (8, 130), (33, 256)])
def test_gradients_match_gather_path(shape):
    h, w = shape
    grid, pts = _case(h=h, w=w, n=97)
    cot_seed = jax.random.normal(jax.random.PRNGKey(7), (3, 8, 97))

    def loss_kernel(g, p):
        return jnp.sum(plane_bilinear(g, p) * cot_seed)

    def loss_ref(g, p):
        return jnp.sum(plane_bilinear_ref(g, p) * cot_seed)

    dg_k, dp_k = jax.grad(loss_kernel, argnums=(0, 1))(grid, pts)
    dg_r, dp_r = jax.grad(loss_ref, argnums=(0, 1))(grid, pts)
    # table gradient: scatter-add vs transposed one-hot matmul
    np.testing.assert_allclose(np.asarray(dg_k), np.asarray(dg_r),
                               rtol=3e-2, atol=3e-2)
    # coordinate gradient (trains the flow net through warped plane lookups)
    scale = np.maximum(np.abs(np.asarray(dp_r)).max(), 1.0)
    np.testing.assert_allclose(np.asarray(dp_k) / scale,
                               np.asarray(dp_r) / scale,
                               rtol=3e-2, atol=3e-2)


def test_plane_linear_matches_explicit_interp():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    grid = jax.random.normal(k1, (3, 8, 33), jnp.float32)
    x = jax.random.uniform(k2, (3, 61), jnp.float32, -0.1, 1.1)

    from lidar4d_tpu.ops.plane_onehot import plane_linear

    out = plane_linear(grid, x)
    u = np.clip(np.asarray(x), 0, 1) * 32
    i0 = np.clip(np.floor(u).astype(int), 0, 32)
    i1 = np.minimum(i0 + 1, 32)
    tx = (u - i0)[..., None]
    want = np.stack([
        np.asarray(grid)[p].T[i0[p]] * (1 - tx[p])
        + np.asarray(grid)[p].T[i1[p]] * tx[p]
        for p in range(3)
    ])
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2, atol=2e-2)


def test_forward_dynamic_scalar_t_matches_full_4d():
    """Time-collapsed dynamic planes == forward_dynamic at shared t."""
    from lidar4d_tpu.models.planes_field import Planes4D

    enc = Planes4D(output_dim=8, resolution=(16, 16, 16, 8),
                   multiscale_res=(1, 2))
    params = enc.init(jax.random.PRNGKey(0))
    # non-trivial time planes (init is ones)
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(1), p.shape),
        params,
    )
    xyz = jax.random.uniform(jax.random.PRNGKey(2), (157, 3), jnp.float32)
    for t in (0.0, 0.37, 1.0):
        t_col = jnp.full((157, 1), t, jnp.float32)
        want = enc.forward_dynamic(params, jnp.concatenate([xyz, t_col], -1))
        got = enc.forward_dynamic_scalar_t(params, xyz, jnp.float32(t))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-2, atol=3e-2)

    # gradients flow into the time planes and the coords (flow-warp path)
    def loss(p, x):
        return jnp.sum(enc.forward_dynamic_scalar_t(p, x, jnp.float32(0.4)))

    def loss_ref(p, x):
        t_col = jnp.full((x.shape[0], 1), 0.4, jnp.float32)
        return jnp.sum(enc.forward_dynamic(p, jnp.concatenate([x, t_col], -1)))

    dg, dx = jax.grad(loss, argnums=(0, 1))(params, xyz)
    dg_r, dx_r = jax.grad(loss_ref, argnums=(0, 1))(params, xyz)
    for a, b in zip(jax.tree.leaves(dg), jax.tree.leaves(dg_r)):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=5e-2, atol=5e-2)
    scale = max(float(jnp.abs(dx_r).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(dx) / scale,
                               np.asarray(dx_r) / scale,
                               rtol=5e-2, atol=5e-2)


def test_out_of_range_coordinate_gradient_is_zero():
    grid, _ = _case(n=8)
    pts = jnp.full((3, 8, 2), 1.5, jnp.float32)  # clamped to the border

    def loss(p):
        return jnp.sum(plane_bilinear(grid, p))

    dp = jax.grad(loss)(pts)
    np.testing.assert_allclose(np.asarray(dp), 0.0, atol=1e-6)


def test_plane_bilinear_tables_only_backward():
    """coord_grad=False: identical forward and table gradient, zero pts
    cotangent (used by forward_static, whose pts are ray positions)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from lidar4d_tpu.ops.plane_onehot import plane_bilinear, plane_bilinear_ref

    g = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 24))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (2, 33, 2))
    cot = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 33))

    out = plane_bilinear(g, pts, coord_grad=False)
    ref = plane_bilinear_ref(g, pts)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2 * scale)

    gt = jax.grad(
        lambda gg: jnp.sum(plane_bilinear(gg, pts, coord_grad=False) * cot)
    )(g)
    gr = jax.grad(lambda gg: jnp.sum(plane_bilinear_ref(gg, pts) * cot))(g)
    gscale = float(jnp.abs(gr).max())
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gr),
                               atol=2e-2 * gscale)

    dp = jax.grad(
        lambda pp: jnp.sum(plane_bilinear(g, pp, coord_grad=False))
    )(pts)
    assert float(jnp.abs(dp).max()) == 0.0


def test_forward_dynamic_scalar_t_multi_matches_single():
    """Fused V-variant dynamic planes == V separate scalar-t calls, values
    and gradients (tables, coords) — the density flow-warp fusion."""
    from lidar4d_tpu.models.planes_field import Planes4D

    enc = Planes4D(output_dim=8, resolution=(16, 16, 16, 8),
                   multiscale_res=(1, 2))
    params = enc.init(jax.random.PRNGKey(0))
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(1), p.shape),
        params,
    )
    xyzs = jax.random.uniform(jax.random.PRNGKey(2), (3, 157, 3), jnp.float32)
    ts = jnp.asarray([0.4, 0.47, 0.33], jnp.float32)

    got = enc.forward_dynamic_scalar_t_multi(params, xyzs, ts)
    for v in range(3):
        want = enc.forward_dynamic_scalar_t(params, xyzs[v], ts[v])
        np.testing.assert_allclose(np.asarray(got[v]), np.asarray(want),
                                   rtol=3e-2, atol=3e-2)

    def loss_multi(p, xs):
        return jnp.sum(enc.forward_dynamic_scalar_t_multi(p, xs, ts) ** 2)

    def loss_single(p, xs):
        return sum(
            jnp.sum(enc.forward_dynamic_scalar_t(p, xs[v], ts[v]) ** 2)
            for v in range(3)
        )

    dg, dx = jax.grad(loss_multi, argnums=(0, 1))(params, xyzs)
    dg_r, dx_r = jax.grad(loss_single, argnums=(0, 1))(params, xyzs)
    for a, b in zip(jax.tree.leaves(dg), jax.tree.leaves(dg_r)):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=5e-2, atol=5e-2)
    scale = max(float(jnp.abs(dx_r).max()), 1e-6)
    np.testing.assert_allclose(np.asarray(dx) / scale,
                               np.asarray(dx_r) / scale,
                               rtol=5e-2, atol=5e-2)


def test_plane_linear_kernel_matches_ref():
    """Pallas 1-D interp kernel (interpret mode) vs the XLA one-hot path:
    forward + table/coordinate gradients, padded and unpadded widths."""
    from lidar4d_tpu.ops.plane_onehot import (
        _plane_linear_kernel,
        plane_linear_ref,
    )

    for w in (128, 67):
        k1, k2 = jax.random.split(jax.random.PRNGKey(w))
        grid = jax.random.normal(k1, (5, 8, w), jnp.float32)
        x = jax.random.uniform(k2, (5, 201), jnp.float32, -0.1, 1.1)

        out = _plane_linear_kernel(grid, x)
        ref = plane_linear_ref(grid, x)
        assert out.shape == ref.shape == (5, 201, 8)
        scale = max(float(jnp.abs(ref).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(out) / scale,
                                   np.asarray(ref) / scale,
                                   rtol=2e-2, atol=2e-2)

        cot = jax.random.normal(jax.random.PRNGKey(3), out.shape)
        dg, dx = jax.grad(
            lambda g, xx: jnp.sum(_plane_linear_kernel(g, xx) * cot),
            argnums=(0, 1))(grid, x)
        dg_r, dx_r = jax.grad(
            lambda g, xx: jnp.sum(plane_linear_ref(g, xx) * cot),
            argnums=(0, 1))(grid, x)
        for a, b in ((dg, dg_r), (dx, dx_r)):
            s = max(float(jnp.abs(b).max()), 1e-6)
            np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                       rtol=5e-2, atol=5e-2)


def test_plane_linear_kernel_coord_grad_lead():
    """coord_grad_lead skips (zeros) the coordinate grad of the first k
    planes but leaves every table gradient and the trailing planes' dx
    bit-identical to the full-gradient kernel (the skipped work is dead code
    for its callers — the gate must not perturb the live halves)."""
    from lidar4d_tpu.ops.plane_onehot import _plane_linear_kernel_lead

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    grid = jax.random.normal(k1, (6, 8, 128), jnp.float32)
    x = jax.random.uniform(k2, (6, 173), jnp.float32, -0.1, 1.1)
    cot = jax.random.normal(jax.random.PRNGKey(3), (6, 173, 8))

    out_full = _plane_linear_kernel_lead(0, grid, x)
    dg_full, dx_full = jax.grad(
        lambda g, xx: jnp.sum(_plane_linear_kernel_lead(0, g, xx) * cot),
        argnums=(0, 1))(grid, x)

    for lead in (3, 6):
        out = _plane_linear_kernel_lead(lead, grid, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out_full))
        dg, dx = jax.grad(
            lambda g, xx: jnp.sum(
                _plane_linear_kernel_lead(lead, g, xx) * cot
            ),
            argnums=(0, 1))(grid, x)
        np.testing.assert_array_equal(np.asarray(dg), np.asarray(dg_full))
        np.testing.assert_array_equal(np.asarray(dx[:lead]), 0.0)
        np.testing.assert_array_equal(np.asarray(dx[lead:]),
                                      np.asarray(dx_full[lead:]))


def test_planes4d_dynamic_multi_coord_grad_lead():
    """Model-level lead: coord_grad_lead=1 zeroes variant 0's coordinate
    grads only; table grads and warped-variant dx match the full path
    (both CPU/XLA and the kernel honor the same contract)."""
    from lidar4d_tpu.models.planes_field import Planes4D

    enc = Planes4D(output_dim=8, resolution=(16, 16, 16, 8),
                   multiscale_res=(1, 2))
    params = enc.init(jax.random.PRNGKey(0))
    xyzs = jax.random.uniform(jax.random.PRNGKey(2), (3, 97, 3), jnp.float32)
    ts = jnp.asarray([0.4, 0.47, 0.33], jnp.float32)

    def loss(p, xs, lead):
        return jnp.sum(
            enc.forward_dynamic_scalar_t_multi(p, xs, ts,
                                               coord_grad_lead=lead) ** 2
        )

    dg0, dx0 = jax.grad(lambda p, xs: loss(p, xs, 0), argnums=(0, 1))(
        params, xyzs)
    dg1, dx1 = jax.grad(lambda p, xs: loss(p, xs, 1), argnums=(0, 1))(
        params, xyzs)
    for a, b in zip(jax.tree.leaves(dg0), jax.tree.leaves(dg1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(dx1[0]), 0.0)
    np.testing.assert_array_equal(np.asarray(dx1[1:]), np.asarray(dx0[1:]))
