"""Differentiable bidirectional Chamfer distance (TPU-native).

Replaces the reference's in-repo CUDA extension `utils/chamfer3D/`
(`chamfer3D.cu:11-194`, `dist_chamfer_3D.py:76-83`): returns squared
nearest-neighbor distances and argmin indices in both directions, with a
custom VJP reproducing the analytic gradient the CUDA backward kernel
scatters with atomicAdd (`chamfer3D.cu:154-173`):

    d dist1_i / d x_i =  2 (x_i - y_{nn(i)})
    d dist1_i / d y_j = -2 (x_i - y_j)   summed over i with nn(i) == j

Instead of a quadratic [N, M] distance matrix, the forward is a blocked scan:
the cross term x·yᵀ is a matmul (MXU), the running (min, argmin) is carried
through `lax.scan` tiles, so memory stays O(N · tile) for arbitrarily large
clouds. Padded points are supported by placing them far away (>= _PAD_SENTINEL)
and masking: they then never win an argmin, and queries that are themselves
padding are masked out of losses by the caller via the returned dists.
"""

from functools import partial

import jax
import jax.numpy as jnp

_TILE = 2048


def _nn_one_way(x, y, precision):
    """For each row of x [N,3], squared distance + index of nearest row of y [M,3]."""
    n = x.shape[0]
    m = y.shape[0]
    tile = min(_TILE, m)
    pad = (-m) % tile
    y_pad = jnp.concatenate(
        [y, jnp.full((pad, y.shape[1]), 1e9, y.dtype)], axis=0
    ) if pad else y
    n_tiles = y_pad.shape[0] // tile
    y_tiles = y_pad.reshape(n_tiles, tile, y.shape[1])

    x_norm = jnp.sum(x * x, axis=-1)  # [N]

    def body(carry, y_t):
        best_d, best_i, base = carry
        y_norm = jnp.sum(y_t * y_t, axis=-1)  # [tile]
        # squared distance via matmul: |x|^2 + |y|^2 - 2 x.y  (MXU path).
        # HIGHEST precision (metrics): TPU f32 matmuls default to one bf16
        # pass, which corrupts NN distances by ~1e-1 relative; the 3-pass
        # mode recovers ~f32. Loss paths pass DEFAULT (3x cheaper) — the
        # reference computes its loss-side chamfer under fp16 AMP anyway.
        cross = jax.lax.dot_general(
            x, y_t, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )  # [N, tile]
        d = x_norm[:, None] + y_norm[None, :] - 2.0 * cross
        tile_best = jnp.min(d, axis=1)
        tile_idx = jnp.argmin(d, axis=1).astype(jnp.int32) + base
        take = tile_best < best_d
        best_d = jnp.where(take, tile_best, best_d)
        best_i = jnp.where(take, tile_idx, best_i)
        return (best_d, best_i, base + tile), None

    init = (
        jnp.full((n,), jnp.inf, jnp.float32),
        jnp.zeros((n,), jnp.int32),
        jnp.int32(0),
    )
    (best_d, best_i, _), _ = jax.lax.scan(body, init, y_tiles)
    # the matmul identity can go slightly negative from rounding
    return jnp.maximum(best_d, 0.0), best_i


def _chamfer_fwd_impl(x, y, precision):
    # batched over leading axis
    d1, i1 = jax.vmap(lambda a, b: _nn_one_way(a, b, precision))(x, y)
    d2, i2 = jax.vmap(lambda a, b: _nn_one_way(a, b, precision))(y, x)
    return d1, d2, i1, i2


def _bwd(res, gs):
    x, y, i1, i2 = res
    g1, g2, _, _ = gs  # cotangents for idx outputs are ignored (integers)

    def one(xb, yb, i1b, i2b, g1b, g2b):
        y_nn = jnp.take(yb, i1b, axis=0)          # [N, 3]
        x_nn = jnp.take(xb, i2b, axis=0)          # [M, 3]
        diff1 = xb - y_nn                          # d dist1 / dx = 2*diff1
        diff2 = yb - x_nn                          # d dist2 / dy = 2*diff2
        gx = 2.0 * g1b[:, None] * diff1
        gy = 2.0 * g2b[:, None] * diff2
        # scatter the cross terms (atomicAdd in the CUDA kernel -> segment_sum)
        gy = gy + jax.ops.segment_sum(
            -2.0 * g1b[:, None] * diff1, i1b, num_segments=yb.shape[0]
        )
        gx = gx + jax.ops.segment_sum(
            -2.0 * g2b[:, None] * diff2, i2b, num_segments=xb.shape[0]
        )
        return gx, gy

    gx, gy = jax.vmap(one)(x, y, i1, i2, g1, g2)
    return gx, gy


def _make_chamfer(precision):
    @jax.custom_vjp
    def cd(x, y):
        return _chamfer_fwd_impl(x, y, precision)

    def _fwd(x, y):
        d1, d2, i1, i2 = _chamfer_fwd_impl(x, y, precision)
        return (d1, d2, i1, i2), (x, y, i1, i2)

    cd.defvjp(_fwd, _bwd)
    return cd


# Metric-grade chamfer (PointsMeter, eval): exact f32 distances.
#   x: [B, N, 3], y: [B, M, 3] ->
#   dist1 [B, N], dist2 [B, M], idx1 [B, N] int32, idx2 [B, M] int32
# (same contract as the reference's `chamfer_3DDist`, dist_chamfer_3D.py:76-83)
chamfer_distance = _make_chamfer(jax.lax.Precision.HIGHEST)

# Loss-grade chamfer (train_step CD + flow losses): single-pass bf16 matmul,
# ~3x cheaper; the gradient formula is identical and the reference's training
# losses run under fp16 autocast (runner.py:497-504).
chamfer_distance_fast = _make_chamfer(jax.lax.Precision.DEFAULT)


_PAD_SENTINEL = 1e8


def pad_cloud(points, size):
    """Pad [P, 3] to [size, 3] with a far-away sentinel; returns (padded, count)."""
    p = points.shape[0]
    out = jnp.full((size, 3), _PAD_SENTINEL, points.dtype)
    out = out.at[: min(p, size)].set(points[:size])
    return out, min(p, size)


@partial(jax.jit, static_argnames=("reduction",))
def chamfer_loss(x, y, x_mask=None, y_mask=None, reduction="mean"):
    """Masked symmetric chamfer loss 0.5 * (red(dist1) + red(dist2)).

    Masks select valid (non-padding) points; padded points in the *target*
    cloud must already sit at the sentinel location so they never win a NN.
    """
    d1, d2, _, _ = chamfer_distance(x, y)
    if x_mask is not None:
        d1 = d1 * x_mask
    if y_mask is not None:
        d2 = d2 * y_mask
    if reduction == "mean":
        n1 = jnp.sum(x_mask) if x_mask is not None else d1.size
        n2 = jnp.sum(y_mask) if y_mask is not None else d2.size
        return 0.5 * (jnp.sum(d1) / jnp.maximum(n1, 1) + jnp.sum(d2) / jnp.maximum(n2, 1))
    return 0.5 * (jnp.sum(d1) + jnp.sum(d2))
