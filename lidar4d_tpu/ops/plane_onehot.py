"""Factorized one-hot bilinear plane sampling: gather/scatter-free, MXU-native.

Replaces the XLA gather path for the K-Planes feature planes
(`models/planes_field.py`, reference `model/planes_field.py:56-84` torch
`F.grid_sample`). Bilinear interpolation is separable:

    feat[c, n] = oy_n^T @ G_c @ ox_n

where ox_n in R^W and oy_n in R^H are 2-hot interpolation vectors. Batched
over a block of points this is a matmul per channel — and, crucially, the
backward table update

    dG_c = (oy * cot_c)^T @ ox            (an [H, BN] x [BN, W] matmul)

replaces XLA's scatter-add into the plane (measured 16-100 ns/update on
v5e — the dominant cost of the planes backward, PERF.md). The coordinate
gradient needed to train the flow net through warped plane lookups
(reference lidar4d.py:161-173 takes grads through grid_sample coords) is the
same contraction against the one-hot *derivative* vectors.

Performance notes (measured v5e):
  * the kernel is VPU-bound on the one-hot builds, so they use the tent
    identity  oh = relu(1 - |iota - u|)  with u = x*(W-1) pre-clipped — one
    abs+sub+relu per element instead of integer compare/select chains, and
    the forward never builds the derivative vectors;
  * the VPU contraction (per-point dot of the matmul output against the
    second one-hot) runs over the SMALLER of the two plane axes;
  * MXU matmuls are bf16 with f32 accumulation, matching the fp16-AMP
    envelope the reference runs grid_sample under (runner.py:497-504).

Subgradient convention: at exact integer coordinates the tent form gives a
zero coordinate-gradient (vs. the gather path's one-sided difference) —
measure-zero inputs; everything else matches the gather path to bf16
accuracy.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
# Points per block. 512 keeps the fwd's [C*Hp, BN] f32 matmul output at
# 4 MB for the largest shipped plane (C=8, 256^2) — comfortably inside the
# 16 MB scoped-VMEM budget with the bf16 table copy and one-hot tiles live.
_BN = 512


def _interpret():
    # CPU (tests, virtual meshes) only supports pallas interpret mode
    return jax.default_backend() == "cpu"


def _pad_up(v, m):
    return ((v + m - 1) // m) * m


def _tent_t(u, size, bn, want_d=False):
    """Weighted 2-hot, TRANSPOSED [size, BN] (lane = point), via the tent
    identity (bf16); optionally its d/du (sign form). The transposed layout
    feeds the channel-batched matmuls directly — no in-kernel transpose."""
    # Mosaic's tpu.iota is integer-only; cast to f32 for the tent
    iota = jax.lax.broadcasted_iota(jnp.int32, (size, bn), 0).astype(jnp.float32)
    d = iota - u[None, :]                       # [size, BN]
    oh = jnp.maximum(0.0, 1.0 - jnp.abs(d))
    if not want_d:
        return oh.astype(jnp.bfloat16), None
    dd = jnp.where(oh > 0.0, jnp.sign(d), 0.0)
    return oh.astype(jnp.bfloat16), dd.astype(jnp.bfloat16)


def _fwd_kernel(C, crd_ref, g_ref, out_ref):
    """Grid (P, NB). Blocks: crd [1, 2, BN] = (u, v); g [1, C, Hp, Wp];
    out [1, C, BN].

    Channel-batched: ONE [C*Hp, Wp] x [Wp, BN] MXU matmul contracts W for
    all channels at once (8x larger matmuls than a per-channel loop — the
    loop form measured ~11% MFU), then the H contraction is an elementwise
    multiply against the transposed y one-hot and a SUBLANE reduce (cheaper
    than the per-channel cross-lane reduce it replaces).
    """
    bn = crd_ref.shape[2]
    hp, wp = g_ref.shape[2], g_ref.shape[3]
    oxt, _ = _tent_t(crd_ref[0, 0, :], wp, bn)
    oyt, _ = _tent_t(crd_ref[0, 1, :], hp, bn)
    g2 = g_ref[0].astype(jnp.bfloat16).reshape(C * hp, wp)
    t1 = jax.lax.dot_general(
        g2, oxt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # [C*Hp, BN]
    oytf = oyt.astype(jnp.float32)
    out_ref[0] = jnp.sum(t1.reshape(C, hp, bn) * oytf[None], axis=1)


def _bwd_kernel_tables(C, crd_ref, cot_ref, dg_ref):
    """Table-gradient-only backward (coord_grad=False) — used for plane sets
    sampled at non-learned points (the static (xy, xz, yz) planes, whose pts
    are ray positions). Channel-batched: the scatter-add replacement is ONE
    [C*Hp, BN] x [BN, Wp] matmul whose left operand is the y one-hot scaled
    by the cotangent.

    Grid (P, NB), NB innermost. Blocks: crd [1, 2, BN]; cot [1, C, BN];
    dg [1, C, Hp, Wp].
    """
    b = pl.program_id(1)
    bn = crd_ref.shape[2]
    hp, wp = dg_ref.shape[2], dg_ref.shape[3]

    @pl.when(b == 0)
    def _zero():
        dg_ref[0] = jnp.zeros((C, hp, wp), jnp.float32)

    oxt, _ = _tent_t(crd_ref[0, 0, :], wp, bn)
    oyt, _ = _tent_t(crd_ref[0, 1, :], hp, bn)
    oytf = oyt.astype(jnp.float32)
    a = (oytf[None] * cot_ref[0][:, None, :]).astype(jnp.bfloat16)
    upd = jax.lax.dot_general(
        a.reshape(C * hp, bn), oxt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # [C*Hp, Wp]
    dg_ref[0] = dg_ref[0] + upd.reshape(C, hp, wp)


def _bwd_kernel(C, crd_ref, g_ref, cot_ref, dg_ref, dt_ref):
    """Full backward (tables + coordinates), channel-batched like the
    forward: three [C*Hp, *] matmuls replace 3C per-channel ones.

    Grid (P, NB), NB innermost. Blocks: crd [1, 2, BN]; g [1, C, Hp, Wp];
    cot [1, C, BN]; dg [1, C, Hp, Wp]; dt (du, dv) [1, 2, BN].
    """
    b = pl.program_id(1)
    bn = crd_ref.shape[2]
    hp, wp = g_ref.shape[2], g_ref.shape[3]

    @pl.when(b == 0)
    def _zero():
        dg_ref[0] = jnp.zeros((C, hp, wp), jnp.float32)

    oxt, oxdt = _tent_t(crd_ref[0, 0, :], wp, bn, want_d=True)
    oyt, oydt = _tent_t(crd_ref[0, 1, :], hp, bn, want_d=True)
    oytf = oyt.astype(jnp.float32)
    cotb = cot_ref[0][:, None, :]                  # [C, 1, BN]

    # table gradient: (oy * cot)^T-batched matmul (the MXU replacement for
    # XLA's scatter-add), accumulated over point blocks
    a = (oytf[None] * cotb).astype(jnp.bfloat16)
    upd = jax.lax.dot_general(
        a.reshape(C * hp, bn), oxt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dg_ref[0] = dg_ref[0] + upd.reshape(C, hp, wp)

    # coordinate gradients: contractions against the one-hot derivatives
    g2 = g_ref[0].astype(jnp.bfloat16).reshape(C * hp, wp)
    t1 = jax.lax.dot_general(
        g2, oxt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(C, hp, bn)                           # fwd recompute
    u1 = jax.lax.dot_general(
        g2, oxdt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(C, hp, bn)
    oydtf = oydt.astype(jnp.float32)
    dt_ref[0, 0, :] = jnp.sum(u1 * oytf[None] * cotb, axis=(0, 1))
    dt_ref[0, 1, :] = jnp.sum(t1 * oydtf[None] * cotb, axis=(0, 1))


def _prep(grid, pts):
    p, c, h, w = grid.shape
    n = pts.shape[1]
    hp = max(_pad_up(h, 8), 8)
    wp = max(_pad_up(w, _LANE), _LANE)
    if (hp, wp) != (h, w):
        grid = jnp.pad(grid, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
    # align_corners=True pixel coords, clipped to the border
    u = jnp.clip(pts[..., 0], 0.0, 1.0) * (w - 1)
    v = jnp.clip(pts[..., 1], 0.0, 1.0) * (h - 1)
    crd = jnp.stack([u, v], axis=1).astype(jnp.float32)   # [P, 2, N]
    npad = _pad_up(max(n, 1), _BN)
    if npad != n:
        crd = jnp.pad(crd, ((0, 0), (0, 0), (0, npad - n)))
    return grid, crd, npad


def _coord_block():
    return pl.BlockSpec((1, 2, _BN), lambda p, b: (p, 0, b),
                        memory_space=pltpu.VMEM)


def plane_bilinear(grid, pts, coord_grad=True):
    """Bilinear-sample P feature planes at P point sets (MXU one-hot path).

    coord_grad=False selects a backward that computes only the table
    gradient (one matmul per channel instead of three) and returns a zero
    pts cotangent — correct whenever pts carries no gradient (static
    planes: ray positions). Forward is identical either way.
    """
    if coord_grad:
        return _plane_bilinear_full(grid, pts)
    return _plane_bilinear_tables(grid, pts)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _plane_bilinear_full(grid, pts):
    """Bilinear-sample P feature planes at P point sets (MXU one-hot path).

    Args:
      grid: [P, C, H, W] float32 feature planes.
      pts:  [P, N, 2] in [0, 1]; pts[..., 0] indexes W, pts[..., 1] indexes H
            (same convention as ops.grid_sample.grid_sample_2d).

    Returns:
      [P, C, N] float32 features (bf16 matmul accumulation, ~1e-2 relative
      agreement with the f32 gather path).

    Differentiable in both grid (table update as a transposed one-hot matmul)
    and pts (align_corners=True coordinate gradient, zero outside [0, 1] —
    matching autodiff through `bilinear_corners` except at exact-integer
    pixel coordinates, where the tent subgradient is 0).
    """
    p, c, h, w = grid.shape
    n = pts.shape[1]
    gpad, crd, npad = _prep(grid, pts)
    hp, wp = gpad.shape[2], gpad.shape[3]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, c),
        grid=(p, npad // _BN),
        in_specs=[
            _coord_block(),
            pl.BlockSpec((1, c, hp, wp), lambda pi, b: (pi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, _BN), lambda pi, b: (pi, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c, npad), jnp.float32),
        interpret=_interpret(),
    )(crd, gpad)
    return out[:, :, :n]


def _vjp_fwd(grid, pts):
    return _plane_bilinear_full(grid, pts), (grid, pts)


def _vjp_bwd(res, cot):
    grid, pts = res
    p, c, h, w = grid.shape
    n = pts.shape[1]
    gpad, crd, npad = _prep(grid, pts)
    hp, wp = gpad.shape[2], gpad.shape[3]
    if npad != n:
        cot = jnp.pad(cot, ((0, 0), (0, 0), (0, npad - n)))
    dg, dt = pl.pallas_call(
        functools.partial(_bwd_kernel, c),
        grid=(p, npad // _BN),
        in_specs=[
            _coord_block(),
            pl.BlockSpec((1, c, hp, wp), lambda pi, b: (pi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, _BN), lambda pi, b: (pi, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, hp, wp), lambda pi, b: (pi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, _BN), lambda pi, b: (pi, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, c, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((p, 2, npad), jnp.float32),
        ],
        interpret=_interpret(),
    )(crd, gpad, cot)
    dgrid = dg[:, :, :h, :w]
    # chain du -> d pts: u = clip(px, 0, 1) * (W - 1); clip passes gradient
    # on the closed interval (JAX clip convention, matches the gather path)
    px, py = pts[..., 0], pts[..., 1]
    in_x = ((px >= 0.0) & (px <= 1.0)).astype(jnp.float32)
    in_y = ((py >= 0.0) & (py <= 1.0)).astype(jnp.float32)
    dpx = dt[:, 0, :n] * (w - 1) * in_x
    dpy = dt[:, 1, :n] * (h - 1) * in_y
    return dgrid, jnp.stack([dpx, dpy], axis=-1)


_plane_bilinear_full.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _plane_bilinear_tables(grid, pts):
    return _plane_bilinear_full(grid, pts)


def _vjp_fwd_tables(grid, pts):
    return _plane_bilinear_full(grid, pts), (grid, pts)


def _vjp_bwd_tables(res, cot):
    grid, pts = res
    p, c, h, w = grid.shape
    n = pts.shape[1]
    gpad, crd, npad = _prep(grid, pts)
    hp, wp = gpad.shape[2], gpad.shape[3]
    if npad != n:
        cot = jnp.pad(cot, ((0, 0), (0, 0), (0, npad - n)))
    dg = pl.pallas_call(
        functools.partial(_bwd_kernel_tables, c),
        grid=(p, npad // _BN),
        in_specs=[
            _coord_block(),
            pl.BlockSpec((1, c, _BN), lambda pi, b: (pi, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, hp, wp), lambda pi, b: (pi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c, hp, wp), jnp.float32),
        interpret=_interpret(),
    )(crd, cot)
    return dg[:, :, :h, :w], jnp.zeros_like(pts)


_plane_bilinear_tables.defvjp(_vjp_fwd_tables, _vjp_bwd_tables)


def plane_bilinear_ref(grid, pts):
    """Pure-XLA reference implementation (gather path) of plane_bilinear."""
    from lidar4d_tpu.ops.grid_sample import grid_sample_2d

    def one(g, pt):
        return grid_sample_2d(g, pt).T  # [C, N]

    return jax.vmap(one)(grid, pts)


# --------------------------------------------------------------------- 1-D
def plane_linear_ref(grid, x):
    """Linear-interpolate P 1-D feature tables at P coordinate sets via a
    one-hot MATMUL — pure XLA (CPU fallback / golden reference).

    The 2-hot weight matrix  relu(1 - |iota - u|)  feeds a single
    [N, W] @ [W, C] bf16 matmul; the table gradient is the transposed
    matmul and the coordinate gradient flows through the tent automatically.

    Args:
      grid: [P, C, W] float32.
      x:    [P, N] in [0, 1].
    Returns:
      [P, N, C] float32.
    """
    p, c, w = grid.shape
    u = jnp.clip(x, 0.0, 1.0) * (w - 1)
    iota = jnp.arange(w, dtype=jnp.float32)
    oh = jnp.maximum(0.0, 1.0 - jnp.abs(iota[None, None, :] - u[..., None]))
    return jax.lax.dot_general(
        oh.astype(jnp.bfloat16),
        grid.astype(jnp.bfloat16),
        (((2,), (2,)), ((0,), (0,))),     # batch P, contract W
        preferred_element_type=jnp.float32,
    )  # [P, N, C]


def _lin_fwd_kernel(crd_ref, g_ref, out_ref):
    """Grid (P, NB). Blocks: crd [1, 1, BN]; g [1, C, Sp]; out [1, C, BN].

    The tent 2-hot lives only in VMEM: the XLA path materializes it as a
    [P, N, S] bf16 operand (~2 GB HBM round-trip per plane scale at train
    sample counts — the dominant cost of the time-collapsed dynamic
    planes), the kernel builds it per block and feeds the MXU directly.
    """
    bn = crd_ref.shape[2]
    sp = g_ref.shape[2]
    oht, _ = _tent_t(crd_ref[0, 0, :], sp, bn)
    out_ref[0] = jax.lax.dot_general(
        g_ref[0].astype(jnp.bfloat16), oht, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, BN]


def _lin_fwd_kernel_gather(crd_ref, g_ref, out_ref, *, w):
    """Gather-form 1-D lookup for planes that fit ONE vreg (C = 8 sublanes,
    Sp = 128 lanes): two single-vreg `take_along_axis` register gathers and
    an f32 lerp replace the tent build + M=8 matmul (the r4 probes pinned
    Mosaic's supported gather to exactly this [8, 128] shape). Exact f32 —
    tighter than the bf16 matmul it replaces. `w` is the UNPADDED table
    width (corner clamp bound)."""
    bn = crd_ref.shape[2]
    tab = g_ref[0]                                  # [8, 128] — one vreg
    u = crd_ref[0, 0, :]                            # [BN], in [0, w-1]
    j0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 1)
    j1 = jnp.minimum(j0 + 1, w - 1)
    f = u - j0.astype(jnp.float32)
    outs = []
    for s in range(bn // _LANE):
        sl = slice(s * _LANE, (s + 1) * _LANE)
        i0 = jnp.broadcast_to(j0[sl][None, :], (8, _LANE))
        i1 = jnp.broadcast_to(j1[sl][None, :], (8, _LANE))
        g0 = jnp.take_along_axis(tab, i0, axis=1)
        g1 = jnp.take_along_axis(tab, i1, axis=1)
        ff = f[sl][None, :]
        outs.append((1.0 - ff) * g0 + ff * g1)
    out_ref[0] = jnp.concatenate(outs, axis=1)


def _lin_bwd_kernel(crd_ref, g_ref, cot_ref, dg_ref, dt_ref, *, lead=0,
                    n_planes=1):
    """Grid (P, NB), NB innermost. Blocks: crd [1, 1, BN]; g [1, C, Sp];
    cot [1, C, BN]; dg [1, C, Sp]; dt [1, 1, BN].

    `lead` (static): the first `lead` planes of the P axis skip the
    coordinate-gradient half (the [Sp, BN] g^T@cot matmul + tent-derivative
    contraction — roughly half the kernel's MACs) and write dt = 0. Used for
    planes whose lookup coordinates are raw ray positions (never learned):
    their dx lands in a dead cotangent, but XLA cannot DCE work inside an
    opaque pallas call, so the skip must live here. Table gradients are
    computed identically for every plane."""
    pi = pl.program_id(0)
    b = pl.program_id(1)
    bn = crd_ref.shape[2]
    c, sp = g_ref.shape[1], g_ref.shape[2]
    no_d = lead >= n_planes  # static: no plane needs a coordinate grad

    @pl.when(b == 0)
    def _zero():
        dg_ref[0] = jnp.zeros((c, sp), jnp.float32)

    oht, ohdt = _tent_t(crd_ref[0, 0, :], sp, bn, want_d=not no_d)
    cot = cot_ref[0]                                    # [C, BN] f32
    # table gradient: cot @ tent^T, accumulated over point blocks
    dg_ref[0] = dg_ref[0] + jax.lax.dot_general(
        cot.astype(jnp.bfloat16), oht, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if no_d:
        dt_ref[0, 0, :] = jnp.zeros((bn,), jnp.float32)
        return

    def _coord_grad():
        # coordinate gradient: sum_s (g^T cot)[s, n] * dtent[s, n]
        m = jax.lax.dot_general(
            g_ref[0].astype(jnp.bfloat16), cot.astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )  # [Sp, BN]
        dt_ref[0, 0, :] = jnp.sum(m * ohdt.astype(jnp.float32), axis=0)

    if lead == 0:
        _coord_grad()
    else:
        pl.when(pi >= lead)(_coord_grad)

        @pl.when(pi < lead)
        def _():
            dt_ref[0, 0, :] = jnp.zeros((bn,), jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _plane_linear_kernel_lead(coord_grad_lead, grid, x):
    p, c, w = grid.shape
    n = x.shape[1]
    sp = max(_pad_up(w, _LANE), _LANE)
    if sp != w:
        grid = jnp.pad(grid, ((0, 0), (0, 0), (0, sp - w)))
    u = (jnp.clip(x, 0.0, 1.0) * (w - 1)).astype(jnp.float32)[:, None, :]
    npad = _pad_up(max(n, 1), _BN)
    if npad != n:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, npad - n)))
    kernel = (functools.partial(_lin_fwd_kernel_gather, w=w)
              if (c == 8 and sp == _LANE) else _lin_fwd_kernel)
    out = pl.pallas_call(
        kernel,
        grid=(p, npad // _BN),
        in_specs=[
            pl.BlockSpec((1, 1, _BN), lambda pi, b: (pi, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, sp), lambda pi, b: (pi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, _BN), lambda pi, b: (pi, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c, npad), jnp.float32),
        interpret=_interpret(),
    )(u, grid)
    return out[:, :, :n].transpose(0, 2, 1)  # [P, N, C]


def _lin_vjp_fwd(coord_grad_lead, grid, x):
    return _plane_linear_kernel_lead(coord_grad_lead, grid, x), (grid, x)


def _lin_vjp_bwd(coord_grad_lead, res, cot):
    grid, x = res
    p, c, w = grid.shape
    n = x.shape[1]
    sp = max(_pad_up(w, _LANE), _LANE)
    gpad = grid if sp == w else jnp.pad(grid, ((0, 0), (0, 0), (0, sp - w)))
    u = (jnp.clip(x, 0.0, 1.0) * (w - 1)).astype(jnp.float32)[:, None, :]
    cot_t = cot.transpose(0, 2, 1)  # [P, C, N]
    npad = _pad_up(max(n, 1), _BN)
    if npad != n:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, npad - n)))
        cot_t = jnp.pad(cot_t, ((0, 0), (0, 0), (0, npad - n)))
    dg, dt = pl.pallas_call(
        functools.partial(_lin_bwd_kernel, lead=min(coord_grad_lead, p),
                          n_planes=p),
        grid=(p, npad // _BN),
        in_specs=[
            pl.BlockSpec((1, 1, _BN), lambda pi, b: (pi, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, sp), lambda pi, b: (pi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, _BN), lambda pi, b: (pi, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, sp), lambda pi, b: (pi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, _BN), lambda pi, b: (pi, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p, c, sp), jnp.float32),
            jax.ShapeDtypeStruct((p, 1, npad), jnp.float32),
        ],
        interpret=_interpret(),
    )(u, gpad, cot_t)
    in_rng = ((x >= 0.0) & (x <= 1.0)).astype(jnp.float32)
    dx = dt[:, 0, :n] * (w - 1) * in_rng
    return dg[:, :, :w], dx


_plane_linear_kernel_lead.defvjp(_lin_vjp_fwd, _lin_vjp_bwd)


def _plane_linear_kernel(grid, x):
    # lead=0 alias (full coordinate gradients) — the historical entry point
    return _plane_linear_kernel_lead(0, grid, x)


def plane_linear(grid, x, coord_grad_lead=0):
    """Linear-interpolate P 1-D feature tables at P coordinate sets.

    grid [P, C, W] f32, x [P, N] in [0, 1] -> [P, N, C] f32. Differentiable
    in both grid and x (align_corners tent; zero coordinate gradient outside
    [0, 1]). Dispatches to a Pallas kernel on TPU (tent one-hot stays in
    VMEM; the XLA form round-trips a [P, N, W] bf16 operand through HBM)
    when C fills the 8-sublane tile; XLA path elsewhere.

    coord_grad_lead (static): the first `coord_grad_lead` planes get a ZERO
    coordinate gradient and skip its computation in the backward kernel.
    Only pass it for planes whose coordinates are raw ray positions (never
    learned — e.g. the unwarped variant of the dynamic-plane sweep, whose dx
    dies at the ray geometry): the skip is silent zeroing, not the loud
    NaN-poison of the tables-only paths. Table gradients are unaffected.
    """
    lead = min(coord_grad_lead, grid.shape[0])
    if _interpret() or grid.shape[1] % 8 != 0:
        if lead:
            # match the kernel's dead-coordinate contract on the XLA path so
            # CPU tests exercise identical gradient structure
            x = jnp.concatenate(
                [jax.lax.stop_gradient(x[:lead]), x[lead:]], axis=0
            )
        return plane_linear_ref(grid, x)
    return _plane_linear_kernel_lead(lead, grid, x)
