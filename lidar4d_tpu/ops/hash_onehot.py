"""One-hot matmul hash encoding: gather/scatter-free, MXU-native.

For hash tables whose per-level row count R is small (<= ~4096), the corner
gather `table[idx]` is exactly `onehot(idx) @ table`, and the backward
table update is `onehot(idx).T @ cotangent` — both matmuls. On TPU this
sidesteps XLA's serialized gather (~7-18 ns/row) and scatter-add
(~16-100 ns/row): the one-hot tiles are built in VMEM by the VPU and fed
straight to the MXU, nothing index-shaped ever touches HBM.

Layout notes (Pallas TPU blocks need last-two dims divisible by (8, 128)):
tables are packed [L, F, R] (F sublanes, R lanes), outputs stream as
[L*F, N] and transpose once in XLA; corner sets carry exactly 2^d rows
(the VPU one-hot build is the dominant cost — no zero-weight passes).

This backs the TPU-flagship field configs (few rows x wide features); the
reference-parity configs (2^19-row tables, hash_field.py:106-117) stay on
the XLA gather path in ops.hash_enc — see hash_encode_auto.

Cost model per level: VPU one-hot build O(N * R * 8) + MXU O(N * R * 8);
both linear in R, so R is the capacity/speed knob.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar4d_tpu.ops.hash_enc import HashEncoderSpec, _level_indices

_LANE = 128


def _interpret():
    # CPU (tests, virtual meshes) only supports pallas interpret mode
    return jax.default_backend() == "cpu"


def _block_n(r):
    """Point-block size: keep the [BN, R] one-hot tile around ~1 MB VMEM."""
    target = (1024 * 1024) // max(r, 1)
    return int(max(256, min(2048, (target // _LANE) * _LANE)))


def _build_onehot(idx_ref, wgt_ref, oh_ref):
    """Accumulate the weighted one-hot [BN, R] into a VMEM scratch.

    Unrolled over the 2^d corners for VPU throughput (a fori_loop costs
    ~2x), accumulating IN PLACE via the scratch ref so the Mosaic stack
    holds one [BN, R] buffer instead of 2^d live temps (scoped-vmem OOM).
    The corner count comes from the idx block shape: 2D grids build 4
    passes, 3D grids 8 — the VPU build is the kernel's dominant cost, so
    zero-weight padding passes are never run."""
    bn, r = oh_ref.shape
    n_corners = idx_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (bn, r), 1)
    oh_ref[:] = jnp.zeros((bn, r), jnp.bfloat16)
    for ci in range(n_corners):
        idx = idx_ref[0, ci, :]
        wgt = wgt_ref[0, ci, :]
        oh_ref[:] = oh_ref[:] + jnp.where(
            iota == idx[:, None], wgt[:, None], 0.0
        ).astype(jnp.bfloat16)


def _fwd_kernel(idx_ref, wgt_ref, tab_ref, out_ref, oh_ref):
    """Grid (L, NB). Blocks: idx/wgt [1, 2^d, BN], tab [1, F, R], out [F, BN]."""
    _build_onehot(idx_ref, wgt_ref, oh_ref)
    out_ref[:] = jax.lax.dot_general(
        tab_ref[0].astype(jnp.bfloat16), oh_ref[:],
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [F, BN]


def _bwd_kernel(idx_ref, wgt_ref, cot_ref, dtab_ref, oh_ref):
    """Grid (L, NB), NB innermost: accumulate dtab[l] over point blocks.

    Blocks: idx/wgt [1, 2^d, BN], cot [F, BN], dtab [1, F, R].
    """
    b = pl.program_id(1)

    _build_onehot(idx_ref, wgt_ref, oh_ref)
    upd = jax.lax.dot_general(
        cot_ref[:].astype(jnp.bfloat16), oh_ref[:],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # [F, R]

    @pl.when(b == 0)
    def _():
        dtab_ref[0] = upd

    @pl.when(b > 0)
    def _():
        dtab_ref[0] = dtab_ref[0] + upd


def _prep(spec, x):
    """Corner indices/weights [L, 2^d, N] (level offsets removed)."""
    idxs, wgts = [], []
    for level in range(spec.n_levels):
        li, lw = _level_indices(spec, x, level)
        off = spec.level_offsets[level]
        idxs.append(jnp.stack([i - off for i in li]))
        wgts.append(jnp.stack(list(lw)))
    return jnp.stack(idxs), jnp.stack(wgts)


def _r_max(spec):
    r = max(spec.table_sizes)
    return ((r + _LANE - 1) // _LANE) * _LANE


def _pack_table(spec, table):
    """Flat [rows, F] -> padded transposed [L, F, R_max]."""
    r_max = _r_max(spec)
    parts = []
    for level in range(spec.n_levels):
        off = spec.level_offsets[level]
        size = spec.table_sizes[level]
        part = table[off:off + size].T  # [F, size]
        if size < r_max:
            part = jnp.concatenate(
                [part, jnp.zeros((spec.n_features, r_max - size), table.dtype)],
                axis=1,
            )
        parts.append(part)
    return jnp.stack(parts)


def _unpack_grad(spec, dpacked):
    parts = []
    for level in range(spec.n_levels):
        parts.append(dpacked[level, :, : spec.table_sizes[level]].T)
    return jnp.concatenate(parts, axis=0)


def _fwd_call(spec, packed, idx, wgt, n):
    l = spec.n_levels
    r = packed.shape[2]
    f = spec.n_features
    bn = _block_n(r)
    nc = idx.shape[1]
    pad = (-n) % bn
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((l, nc, pad), idx.dtype)], -1)
        wgt = jnp.concatenate([wgt, jnp.zeros((l, nc, pad), wgt.dtype)], -1)
    nb = idx.shape[2] // bn

    out = pl.pallas_call(
        _fwd_kernel,
        grid=(l, nb),
        in_specs=[
            pl.BlockSpec((1, nc, bn), lambda li, b: (li, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, bn), lambda li, b: (li, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, r), lambda li, b: (li, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f, bn), lambda li, b: (li, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l * f, nb * bn), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bn, r), jnp.bfloat16)],
        interpret=_interpret(),
    )(idx, wgt, packed)
    # [L*F, N] -> [N, L*F]
    return out.T[:n]


def _bwd_call(spec, idx, wgt, cot_t, n_padded):
    """cot_t: [L*F, N_padded] -> dpacked [L, F, R]."""
    l = spec.n_levels
    r = _r_max(spec)
    f = spec.n_features
    bn = _block_n(r)
    nc = idx.shape[1]
    nb = n_padded // bn

    return pl.pallas_call(
        _bwd_kernel,
        grid=(l, nb),
        in_specs=[
            pl.BlockSpec((1, nc, bn), lambda li, b: (li, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, bn), lambda li, b: (li, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, bn), lambda li, b: (li, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, r), lambda li, b: (li, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, f, r), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bn, r), jnp.bfloat16)],
        interpret=_interpret(),
    )(idx, wgt, cot_t)


# --------------------------------------------------------- factorized kernel
#
# The [BN, R] one-hot build above costs O(N * R) VPU compares per corner —
# the kernel's dominant cost, linear in the table size. Factorizing the row
# index as  row = hi * 128 + lo  splits the gather into
#
#   step1[(h,f), n] = sum_lo T[l, (h,f), lo] * onehot_lo[lo, n]   (MXU)
#   out[f, n]       = sum_h  step1[(h,f), n] * (hi[n] == h)       (VPU)
#
# so the VPU only ever builds [128, BN] tiles (LANE-wide one-hots and the
# hi-group mask) — O(N * 128) compares regardless of R — while the MXU
# absorbs the R-dependence as a [HI*F, 128] x [128, BN] matmul (the same
# FLOPs the classic kernel feeds it, already ~free). The backward table
# update factorizes the same way: dT[l, lo, (h,f)] = onehot_lo @ hicot.T
# where hicot[(h,f), n] = (hi[n] == h) * cot[f, n].

_LOG2_LANE = 7  # lo = idx & 127, hi = idx >> 7


def _block_n_fact(hf):
    """Per-block points. The unrolled corner loop leaves ~3 [hf, BN] f32/bf16
    temps per iteration on the Mosaic stack (the classic kernel OOMed from
    exactly this pattern at [BN, R] scale) — 512 keeps the worst case
    (8 corners, hf=256) ~5 MB inside the 16 MB scoped-VMEM budget."""
    return 512


# step1 VMEM bound for the corner-batched matmul: [HI*F, nc*BN] f32 must
# stay well inside the 16 MB scoped budget (2 MB at the flagship R=2048 /
# F=8 / 8 corners); larger tables fall back to the per-corner loop.
_CORNER_BATCH_MAX_BYTES = 6 * 1024 * 1024


def _fwd_kernel_fact(idx_ref, wgt_ref, tab_ref, out_ref):
    """Grid (L, NB). Blocks: idx/wgt [1, 2^d, BN], tab [1, HI*F, 128],
    out [F, BN].

    The 2^d corner lookups share the level's table, so their lane-wide lo
    one-hots concatenate along the lane axis into ONE
    [HI*F, 128] x [128, 2^d*BN] matmul — 8x larger than the per-corner
    form, which ran at ~30% MFU on the 128-row flagship tables. The
    per-corner hi-group mask+reduce is unchanged (static lane slices)."""
    hf = tab_ref.shape[1]
    f, bn = out_ref.shape
    nc = idx_ref.shape[1]
    hi_n = hf // f
    tab = tab_ref[0].astype(jnp.bfloat16)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LANE, bn), 0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (hf, bn), 0) // f
    batched = hf * nc * bn * 4 <= _CORNER_BATCH_MAX_BYTES

    ohs, his = [], []
    for ci in range(nc):
        idx = idx_ref[0, ci, :]
        wgt = wgt_ref[0, ci, :]
        lo = idx & (_LANE - 1)
        his.append(idx >> _LOG2_LANE)
        ohs.append(jnp.where(
            iota_lo == lo[None, :], wgt[None, :], 0.0
        ).astype(jnp.bfloat16))  # [128, BN]

    acc = jnp.zeros((f, bn), jnp.float32)
    if batched:
        step1 = jax.lax.dot_general(
            tab, jnp.concatenate(ohs, axis=1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [HI*F, nc*BN]
        for ci in range(nc):
            s = step1[:, ci * bn:(ci + 1) * bn]
            masked = jnp.where(iota_h == his[ci][None, :], s, 0.0)
            acc = acc + masked.reshape(hi_n, f, bn).sum(axis=0)
    else:
        for ci in range(nc):
            step1 = jax.lax.dot_general(
                tab, ohs[ci], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [HI*F, BN]
            masked = jnp.where(iota_h == his[ci][None, :], step1, 0.0)
            acc = acc + masked.reshape(hi_n, f, bn).sum(axis=0)
    out_ref[:] = acc


def _bwd_kernel_fact(idx_ref, wgt_ref, cot_ref, dtab_ref):
    """Grid (L, NB), NB innermost. Blocks: idx/wgt [1, 2^d, BN],
    cot [F, BN], dtab [1, 128, HI*F] (lo-major layout).

    Corner-batched like the forward: the 2^d per-corner [128, BN] x
    [BN, HI*F] matmuls concatenate along the contraction (lane) axis into
    one [128, 2^d*BN] x [2^d*BN, HI*F]."""
    b = pl.program_id(1)
    hf = dtab_ref.shape[2]
    f, bn = cot_ref.shape
    nc = idx_ref.shape[1]
    hi_n = hf // f
    cot_tiled = jnp.broadcast_to(
        cot_ref[:][None], (hi_n, f, bn)
    ).reshape(hf, bn).astype(jnp.bfloat16)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LANE, bn), 0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (hf, bn), 0) // f
    batched = hf * nc * bn * 2 <= _CORNER_BATCH_MAX_BYTES

    ohs, hicots = [], []
    for ci in range(nc):
        idx = idx_ref[0, ci, :]
        wgt = wgt_ref[0, ci, :]
        lo = idx & (_LANE - 1)
        hi = idx >> _LOG2_LANE
        ohs.append(jnp.where(
            iota_lo == lo[None, :], wgt[None, :], 0.0
        ).astype(jnp.bfloat16))
        hicots.append(jnp.where(iota_h == hi[None, :], cot_tiled, 0).astype(
            jnp.bfloat16
        ))

    if batched:
        acc = jax.lax.dot_general(
            jnp.concatenate(ohs, axis=1),
            jnp.concatenate(hicots, axis=1),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [128(lo), HI*F]
    else:
        acc = jnp.zeros((_LANE, hf), jnp.float32)
        for ci in range(nc):
            acc = acc + jax.lax.dot_general(
                ohs[ci], hicots[ci], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(b == 0)
    def _():
        dtab_ref[0] = acc

    @pl.when(b > 0)
    def _():
        dtab_ref[0] = dtab_ref[0] + acc


def _pack_table_fact(spec, table):
    """Flat [rows, F] -> [L, HI*F, 128] with [l, h*F+f, lo] = T_l[h*128+lo, f]."""
    r_max = _r_max(spec)
    hi_n = r_max // _LANE
    f = spec.n_features
    parts = []
    for level in range(spec.n_levels):
        off = spec.level_offsets[level]
        size = spec.table_sizes[level]
        part = table[off:off + size]
        if size < r_max:
            part = jnp.concatenate(
                [part, jnp.zeros((r_max - size, f), table.dtype)], axis=0
            )
        # [HI*128, F] -> [HI, 128, F] -> [HI, F, 128] -> [HI*F, 128]
        parts.append(
            part.reshape(hi_n, _LANE, f).transpose(0, 2, 1).reshape(hi_n * f, _LANE)
        )
    return jnp.stack(parts)


def _unpack_grad_fact(spec, dpacked):
    """[L, 128, HI*F] (lo-major) -> flat [rows, F]."""
    r_max = dpacked.shape[1] * (dpacked.shape[2] // spec.n_features)
    hi_n = r_max // _LANE
    f = spec.n_features
    parts = []
    for level in range(spec.n_levels):
        # [128(lo), HI*F] -> [128, HI, F] -> [HI, 128, F] -> [HI*128, F]
        full = (
            dpacked[level]
            .reshape(_LANE, hi_n, f)
            .transpose(1, 0, 2)
            .reshape(r_max, f)
        )
        parts.append(full[: spec.table_sizes[level]])
    return jnp.concatenate(parts, axis=0)


def _fwd_call_fact(spec, packed, idx, wgt, n):
    # level-block count from the operands, not the spec: the fused
    # multi-variant path (hash_encode_fact_multi) stacks V variants' levels
    # into one grid, so packed/idx carry V * n_levels blocks
    l = packed.shape[0]
    hf = packed.shape[1]
    f = spec.n_features
    bn = _block_n_fact(hf)
    nc = idx.shape[1]
    pad = (-n) % bn
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((l, nc, pad), idx.dtype)], -1)
        wgt = jnp.concatenate([wgt, jnp.zeros((l, nc, pad), wgt.dtype)], -1)
    nb = idx.shape[2] // bn

    # The gather-form kernel (see _fwd_kernel_fact_gather) also covers the
    # plain/multi fact paths: one grid step = one level block (n_levels=1),
    # and F = 8 needs no sublane reduce (hper = 1). Exact f32 lookups and
    # measured faster than the one-hot build + matmul at every shipped spec.
    use_gather = (FOLDED_FWD_VARIANT == "gather" and hf % 8 == 0
                  and 8 % f == 0 and f <= 8)
    kernel = (functools.partial(_fwd_kernel_fact_gather, nc=nc, n_levels=1,
                                f_out=f)
              if use_gather else _fwd_kernel_fact)
    out = pl.pallas_call(
        kernel,
        grid=(l, nb),
        in_specs=[
            pl.BlockSpec((1, nc, bn), lambda li, b: (li, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, bn), lambda li, b: (li, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hf, _LANE), lambda li, b: (li, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f, bn), lambda li, b: (li, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l * f, nb * bn), jnp.float32),
        interpret=_interpret(),
    )(idx, wgt, packed)
    return out.T[:n]


def _bwd_call_fact(spec, idx, wgt, cot_t, n_padded):
    """cot_t: [L*F, N_padded] -> dpacked [L, 128, HI*F]."""
    l = spec.n_levels
    r = _r_max(spec)
    hf = (r // _LANE) * spec.n_features
    f = spec.n_features
    bn = _block_n_fact(hf)
    nc = idx.shape[1]
    nb = n_padded // bn

    return pl.pallas_call(
        _bwd_kernel_fact,
        grid=(l, nb),
        in_specs=[
            pl.BlockSpec((1, nc, bn), lambda li, b: (li, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nc, bn), lambda li, b: (li, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, bn), lambda li, b: (li, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _LANE, hf), lambda li, b: (li, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, _LANE, hf), jnp.float32),
        interpret=_interpret(),
    )(idx, wgt, cot_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def hash_encode_onehot_fact(spec: HashEncoderSpec, table, x):
    """Factorized one-hot hash encode (same contract as hash_encode_onehot)."""
    idx, wgt = _prep(spec, x)
    return _fwd_call_fact(spec, _pack_table_fact(spec, table), idx, wgt,
                          x.shape[0])


def _vjp_fwd_fact(spec, table, x):
    return hash_encode_onehot_fact(spec, table, x), (x,)


def _vjp_bwd_fact(spec, res, cot):
    (x,) = res
    n = x.shape[0]
    idx, wgt = _prep(spec, x)
    hf = (_r_max(spec) // _LANE) * spec.n_features
    bn = _block_n_fact(hf)
    pad = (-n) % bn
    if pad:
        l = spec.n_levels
        nc = idx.shape[1]
        idx = jnp.concatenate([idx, jnp.zeros((l, nc, pad), idx.dtype)], -1)
        wgt = jnp.concatenate([wgt, jnp.zeros((l, nc, pad), wgt.dtype)], -1)
        cot = jnp.concatenate(
            [cot, jnp.zeros((pad, cot.shape[1]), cot.dtype)], 0
        )
    dpacked = _bwd_call_fact(spec, idx, wgt, cot.T, n + pad)
    return _unpack_grad_fact(spec, dpacked), _poison_coord_grad(x, cot)


hash_encode_onehot_fact.defvjp(_vjp_fwd_fact, _vjp_bwd_fact)


def _poison_coord_grad(x, cot):
    """Coordinate cotangent for the one-hot kernels: NaN, not zero.

    The kernels never compute d/dx (corner weights enter as constants), so a
    caller that differentiates through the coordinates would silently train
    with zero x-grads if we returned zeros. NaN instead: on every supported
    path the coordinate cotangent dies at non-learned inputs (ray positions)
    or a stop_gradient (warped neighbor lookups, lidar4d.py density();
    hierarchical fine-z is detached in renderer.render_rays), so the NaN is
    discarded — but a path that reaches parameters (e.g. a removed
    stop_gradient) turns the loss NaN on the first step: loud, not wrong.
    Gated on the incoming cotangent being nonzero so a transpose that runs
    this bwd with a materialized-zero cotangent stays zero. Callers that
    legitimately need d/dx use hash_encode_auto(coord_grad=True), which
    forces the differentiable gather path."""
    poison = jnp.where(jnp.any(cot != 0.0), jnp.nan, 0.0).astype(x.dtype)
    return poison * jnp.ones_like(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def hash_encode_onehot(spec: HashEncoderSpec, table, x):
    """MXU one-hot hash encode. Same contract as ops.hash_enc.hash_encode.

    table: [rows, F]; x: [N, d] in [0, 1]. Returns [N, L*F] (bf16 matmul
    accumulation — features agree with the gather path to ~1e-2 relative).
    """
    idx, wgt = _prep(spec, x)
    return _fwd_call(spec, _pack_table(spec, table), idx, wgt, x.shape[0])


def _vjp_fwd(spec, table, x):
    return hash_encode_onehot(spec, table, x), (x,)


def _vjp_bwd(spec, res, cot):
    (x,) = res
    n = x.shape[0]
    idx, wgt = _prep(spec, x)
    bn = _block_n(_r_max(spec))
    pad = (-n) % bn
    if pad:
        l = spec.n_levels
        nc = idx.shape[1]
        idx = jnp.concatenate([idx, jnp.zeros((l, nc, pad), idx.dtype)], -1)
        wgt = jnp.concatenate([wgt, jnp.zeros((l, nc, pad), wgt.dtype)], -1)
        cot = jnp.concatenate(
            [cot, jnp.zeros((pad, cot.shape[1]), cot.dtype)], 0
        )
    dpacked = _bwd_call(spec, idx, wgt, cot.T, n + pad)
    return _unpack_grad(spec, dpacked), _poison_coord_grad(x, cot)


hash_encode_onehot.defvjp(_vjp_fwd, _vjp_bwd)


def onehot_eligible(spec: HashEncoderSpec, max_rows=4096):
    # n_features must fill the 8-sublane tile: both kernels stream outputs
    # as [F, BN] blocks and Mosaic requires the sublane dim divisible by 8
    # (the reference-parity specs' F=4 crash the lowering otherwise — they
    # belong on the gather path regardless).
    return spec.n_features % 8 == 0 and max(spec.table_sizes) <= max_rows


# ------------------------------------------------- fused multi-variant encode
#
# The density query's flow-warp aggregation (models/lidar4d.py density())
# encodes THREE point sets per step — (x, t) plus the two flow-warped
# neighbors (x+f, t+dt), (x+b, t-dt) — through the same dynamic hash planes.
# Fusing the V variants into ONE pallas sweep (grid (V*L, NB)) removes two
# kernel launches and their XLA glue per plane per density call. Only the
# first variant's table is differentiable: the reference stop-gradients the
# warped neighbor hash lookups (lidar4d.py:160,169), so the fused backward
# runs at exactly 1/V of the forward's grid — the neighbor sweeps are
# forward-only by construction, not by autodiff pruning.


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def hash_encode_fact_multi(spec: HashEncoderSpec, table, tables_ng, xs):
    """Fused factorized one-hot encode of V point sets / table variants.

    Args:
      spec: per-variant encoder spec (shared).
      table: [rows, F] variant-0 table (differentiable).
      tables_ng: [V-1, rows, F] neighbor-variant tables (treated as
        constants in the backward — table cotangent is zero).
      xs: [V, N, d] in [0, 1]; xs[0] pairs with `table`.

    Returns [V, N, L*F] (identical per-variant to hash_encode_onehot_fact).
    """
    v, n = xs.shape[0], xs.shape[1]
    packs, idxs, wgts = [], [], []
    for vi in range(v):
        tab = table if vi == 0 else tables_ng[vi - 1]
        packs.append(_pack_table_fact(spec, tab))
        i, w = _prep(spec, xs[vi])
        idxs.append(i)
        wgts.append(w)
    out = _fwd_call_fact(
        spec,
        jnp.concatenate(packs, axis=0),
        jnp.concatenate(idxs, axis=0),
        jnp.concatenate(wgts, axis=0),
        n,
    )  # [N, V*L*F]
    lf = spec.n_levels * spec.n_features
    return out.reshape(n, v, lf).transpose(1, 0, 2)


def _vjp_fwd_multi(spec, table, tables_ng, xs):
    return hash_encode_fact_multi(spec, table, tables_ng, xs), (
        xs, tables_ng.shape)


def _vjp_bwd_multi(spec, res, cot):
    xs, ng_shape = res
    x0 = xs[0]
    cot0 = cot[0]  # [N, L*F]
    n = x0.shape[0]
    idx, wgt = _prep(spec, x0)
    hf = (_r_max(spec) // _LANE) * spec.n_features
    bn = _block_n_fact(hf)
    pad = (-n) % bn
    if pad:
        l = spec.n_levels
        nc = idx.shape[1]
        idx = jnp.concatenate([idx, jnp.zeros((l, nc, pad), idx.dtype)], -1)
        wgt = jnp.concatenate([wgt, jnp.zeros((l, nc, pad), wgt.dtype)], -1)
        cot0 = jnp.concatenate(
            [cot0, jnp.zeros((pad, cot0.shape[1]), cot0.dtype)], 0
        )
    dpacked = _bwd_call_fact(spec, idx, wgt, cot0.T, n + pad)
    # Coordinate poison is gated PER VARIANT: warped neighbor coords
    # (x + flow) feed the learned flow net, and their cotangent is zero
    # through the caller's stop_gradient — a blanket any(cot) gate would
    # leak NaN into the flow gradients via the neighbor variants.
    any_v = jnp.any(cot != 0.0, axis=(1, 2))          # [V]
    poison = jnp.where(any_v, jnp.nan, 0.0).astype(xs.dtype)
    return (
        _unpack_grad_fact(spec, dpacked),
        jnp.zeros(ng_shape, jnp.float32),
        poison[:, None, None] * jnp.ones_like(xs),
    )


hash_encode_fact_multi.defvjp(_vjp_fwd_multi, _vjp_bwd_multi)


# ------------------------------------------------- interpT-folded encode
#
# The Lagrange "interpT" feature interpolation (ops.hash_enc.
# lagrange_time_interp, reference hash_field.py:65-74) acts LINEARLY on the
# encoded features, and the encode is linear in the table — so the basis
# contraction commutes into the table:
#
#   interpT(Encode(T, x), t)  ==  Encode(fold(T, w(t)), x),
#   fold(T, w)[r, f'] = sum_b w_b * T[r, b*F' + f']      (F' = F / num_basis)
#
# The folded sweep runs at F' = F/B features: with the flagship B = 4, the
# hi-group mask+reduce (the kernel's second-largest VPU cost, [HI*F, BN] per
# corner) and the MXU matmul shrink 4x, and the post-encode [N, L*F] -> XLA
# einsum disappears. The lane-wide lo one-hot builds are unchanged
# (R-independent). Exactness: the fold is a reassociation of the same linear
# contraction — within f32 rounding of the unfolded form, and the kernel's
# bf16 matmul tolerance (~1e-2) dominates either way.
#
# F' < 8 breaks the [F, BN] output-block sublane rule the plain kernels rely
# on, so the folded forward uses a GROUPED kernel: grid (V, NB), one block
# carries ALL L levels, out rows = pad8(L*F') (a static zero pad). The
# backward needs no new kernel either — and it FOLDS too: the basis
# contraction commutes out of the table gradient,
#
#   dT[r, b*F'+f'] = sum_n oh[r, n] * (w_b * cot'[n, f'])
#                  = w_b * dT'[r, f'],   dT' = folded-spec backward on cot'
#
# so _bwd_call_fact runs at F' (hicot masks [HI*F', BN] instead of
# [HI*F, BN] — 4x fewer mask elems at the flagship B = 4) and one XLA
# outer product with w expands dT' to the full-F table gradient. The w_b
# scale moves outside the bf16-matmul accumulation (it multiplied INTO the
# bf16 cotangent cast before) — same quality class, not bitwise.


def _fwd_kernel_fact_grouped(idx_ref, wgt_ref, tab_ref, out_ref, *,
                             nc, n_levels, f_out):
    """Grid (V, NB). Blocks: idx/wgt [1, L*nc, BN], tab [1, L*HF', 128],
    out [RP, BN] with RP = pad8(L*f_out); rows beyond L*f_out are zero."""
    hfp = tab_ref.shape[1] // n_levels  # HI * f_out
    rp, bn = out_ref.shape
    hi_n = hfp // f_out
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LANE, bn), 0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (hfp, bn), 0) // f_out

    accs = []
    for li in range(n_levels):
        tab = tab_ref[0, li * hfp:(li + 1) * hfp, :].astype(jnp.bfloat16)
        ohs, his = [], []
        for ci in range(nc):
            idx = idx_ref[0, li * nc + ci, :]
            wgt = wgt_ref[0, li * nc + ci, :]
            lo = idx & (_LANE - 1)
            his.append(idx >> _LOG2_LANE)
            ohs.append(jnp.where(
                iota_lo == lo[None, :], wgt[None, :], 0.0
            ).astype(jnp.bfloat16))
        step1 = jax.lax.dot_general(
            tab, jnp.concatenate(ohs, axis=1), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [HF', nc*BN]
        acc = jnp.zeros((f_out, bn), jnp.float32)
        for ci in range(nc):
            s = step1[:, ci * bn:(ci + 1) * bn]
            masked = jnp.where(iota_h == his[ci][None, :], s, 0.0)
            acc = acc + masked.reshape(hi_n, f_out, bn).sum(axis=0)
        accs.append(acc)
    if rp > n_levels * f_out:
        accs.append(jnp.zeros((rp - n_levels * f_out, bn), jnp.float32))
    out_ref[:] = jnp.concatenate(accs, axis=0)


def _fwd_kernel_fact_gather(idx_ref, wgt_ref, tab_ref, out_ref, *, nc,
                            n_levels, f_out):
    """GATHER-form grouped folded forward — the corner lookup as a
    single-vreg `take_along_axis` register gather instead of a one-hot
    build + MXU matmul (measured r4: dyn 1.75x, flow 2.0x the one-hot
    form's forward, and EXACT f32 — scripts/perf_probe_r4h.py).

    Per corner-level, per 128-point lane chunk, per 8-sublane table row
    group g (rows are (h, f') pairs, h = row // f_out):

        got  = take_along_axis(T[g*8:(g+1)*8, :], lo_b, axis=1)  # [8,128]
        acc += where(hi_b == srow + g*(8//f_out), got * wgt_b, 0)

    followed by one strided sublane reduce per level collapsing the h
    rows. Blocks: idx/wgt [1, L*nc, BN]; tab [1, L*HF', 128] (fact
    layout); out [RP, BN], RP = pad8(L*f_out)."""
    hfp = tab_ref.shape[1] // n_levels
    rp, bn = out_ref.shape
    n_groups = hfp // 8
    hper = 8 // f_out
    srow = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 0) // f_out

    accs = []
    for li in range(n_levels):
        chunk_accs = []
        for s in range(bn // _LANE):
            sl = slice(s * _LANE, (s + 1) * _LANE)
            acc = jnp.zeros((8, _LANE), jnp.float32)
            for ci in range(nc):
                idx = idx_ref[0, li * nc + ci, sl]
                wgt = wgt_ref[0, li * nc + ci, sl]
                lo = idx & (_LANE - 1)
                hi = idx >> _LOG2_LANE
                lo_b = jnp.broadcast_to(lo[None, :], (8, _LANE))
                hi_b = jnp.broadcast_to(hi[None, :], (8, _LANE))
                wgt_b = wgt[None, :]
                for g in range(n_groups):
                    tg = tab_ref[0, li * hfp + g * 8: li * hfp + (g + 1) * 8,
                                 :]
                    got = jnp.take_along_axis(tg, lo_b, axis=1)
                    acc = acc + jnp.where(
                        hi_b == srow + g * hper, got * wgt_b, 0.0)
            chunk_accs.append(acc)
        acc8 = jnp.concatenate(chunk_accs, axis=1)       # [8, BN]
        rows = []
        for f in range(f_out):
            r = acc8[f: f + 1, :]
            for k in range(1, hper):
                r = r + acc8[k * f_out + f: k * f_out + f + 1, :]
            rows.append(r)
        accs.append(jnp.concatenate(rows, axis=0))       # [f_out, BN]
    if rp > n_levels * f_out:
        accs.append(jnp.zeros((rp - n_levels * f_out, bn), jnp.float32))
    out_ref[:] = jnp.concatenate(accs, axis=0)


# Grouped folded FORWARD kernel choice: "gather" (register take_along_axis,
# exact f32, measured 1.75-2x the one-hot form) with "onehot" kept for A/B
# probes and as the fallback for table shapes the gather form cannot take
# (hfp % 8 != 0, i.e. HI*F' under one sublane group).
FOLDED_FWD_VARIANT = "gather"


def _fwd_call_fact_grouped(spec_f, packed, idx, wgt, n):
    """packed [V, L*HF', 128], idx/wgt [V, L*nc, N] -> [V, N, L*F']."""
    v = packed.shape[0]
    l = spec_f.n_levels
    f = spec_f.n_features
    hfp = (_r_max(spec_f) // _LANE) * f
    rp = ((l * f + 7) // 8) * 8
    bn = _block_n_fact(hfp)
    lnc = idx.shape[1]
    nc = lnc // l
    pad = (-n) % bn
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((v, lnc, pad), idx.dtype)], -1)
        wgt = jnp.concatenate([wgt, jnp.zeros((v, lnc, pad), wgt.dtype)], -1)
    nb = idx.shape[2] // bn

    use_gather = (FOLDED_FWD_VARIANT == "gather" and hfp % 8 == 0
                  and 8 % f == 0)
    kernel = _fwd_kernel_fact_gather if use_gather else \
        _fwd_kernel_fact_grouped
    out = pl.pallas_call(
        functools.partial(kernel, nc=nc, n_levels=l,
                          f_out=f),
        grid=(v, nb),
        in_specs=[
            pl.BlockSpec((1, lnc, bn), lambda vi, b: (vi, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lnc, bn), lambda vi, b: (vi, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, l * hfp, _LANE), lambda vi, b: (vi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rp, bn), lambda vi, b: (vi, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v * rp, nb * bn), jnp.float32),
        interpret=_interpret(),
    )(idx, wgt, packed)
    out = out.reshape(v, rp, nb * bn)[:, : l * f, :n]
    return out.transpose(0, 2, 1)


def _fold_table(table, w, fp):
    """[rows, F] x Lagrange weights [B] -> [rows, F'] (F' = F/B)."""
    b = w.shape[-1]
    return jnp.einsum(
        "rbf,b->rf", table.reshape(table.shape[0], b, fp), w,
        precision=jax.lax.Precision.HIGHEST,
    )


def _poison_like(ref, cot):
    poison = jnp.where(jnp.any(cot != 0.0), jnp.nan, 0.0).astype(ref.dtype)
    return poison * jnp.ones_like(ref)


def _folded_spec(spec, num_basis):
    import dataclasses

    return dataclasses.replace(spec, n_features=spec.n_features // num_basis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def hash_encode_folded(spec: HashEncoderSpec, table, x, w):
    """interpT(hash_encode(spec, table, x), t) with the Lagrange contraction
    folded into the table. w: [B] = lagrange_weights(t, B). Returns [N, L*F/B].
    """
    b = w.shape[0]
    fp = spec.n_features // b
    spec_f = _folded_spec(spec, b)
    tab_f = _fold_table(table, w, fp)
    idx, wgt = _prep(spec_f, x)
    lnc = spec_f.n_levels * idx.shape[1]
    out = _fwd_call_fact_grouped(
        spec_f,
        _pack_table_fact(spec_f, tab_f).reshape(1, -1, _LANE),
        idx.reshape(1, lnc, -1),
        wgt.reshape(1, lnc, -1),
        x.shape[0],
    )
    return out[0]


def _vjp_fwd_folded(spec, table, x, w):
    return hash_encode_folded(spec, table, x, w), (x, w)


def _bwd_kernel_fact_grouped(idx_ref, wgt_ref, cot_ref, dtab_ref, *, nc,
                             n_levels, f_out):
    """Grouped folded-spec backward: grid (NB,), one block carries ALL L
    levels (F' < 8 breaks the plain bwd kernel's [F, BN] cot block rule;
    here cot rows are pad8(L*F') and levels are VALUE-sliced after load).

    Blocks: idx/wgt [L*nc, BN]; cot [RP, BN]; dtab [128, L*HF'] (whole
    array — accumulated over the NB grid)."""
    b = pl.program_id(0)
    lhfp = dtab_ref.shape[1]
    hfp = lhfp // n_levels
    bn = idx_ref.shape[1]
    hi_n = hfp // f_out
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LANE, bn), 0)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (hfp, bn), 0) // f_out
    cot_all = cot_ref[:]

    accs = []
    for li in range(n_levels):
        cot_l = cot_all[li * f_out:(li + 1) * f_out, :]      # [F', BN]
        cot_tiled = jnp.broadcast_to(
            cot_l[None], (hi_n, f_out, bn)
        ).reshape(hfp, bn).astype(jnp.bfloat16)
        ohs, hicots = [], []
        for ci in range(nc):
            idx = idx_ref[li * nc + ci, :]
            wgt = wgt_ref[li * nc + ci, :]
            lo = idx & (_LANE - 1)
            hi = idx >> _LOG2_LANE
            ohs.append(jnp.where(
                iota_lo == lo[None, :], wgt[None, :], 0.0
            ).astype(jnp.bfloat16))
            hicots.append(jnp.where(
                iota_h == hi[None, :], cot_tiled, 0
            ).astype(jnp.bfloat16))
        accs.append(jax.lax.dot_general(
            jnp.concatenate(ohs, axis=1),
            jnp.concatenate(hicots, axis=1),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))                                                   # [128, HF']
    acc = jnp.concatenate(accs, axis=1)                      # [128, L*HF']

    @pl.when(b == 0)
    def _():
        dtab_ref[:] = acc

    @pl.when(b > 0)
    def _():
        dtab_ref[:] = dtab_ref[:] + acc


def _folded_table_bwd(spec, x, w, cot):
    """Table gradient of hash_encode_folded: folded-spec backward on cot'
    (F' masks — 4x fewer mask elems than the full-F form at B = 4), then
    expand by the Lagrange weights (see the fold rationale above).
    Returns [rows, F]."""
    b = w.shape[0]
    fp = spec.n_features // b
    spec_f = _folded_spec(spec, b)
    l = spec_f.n_levels
    n = x.shape[0]
    idx, wgt = _prep(spec_f, x)
    nc = idx.shape[1]
    hfp = (_r_max(spec_f) // _LANE) * fp
    rp = ((l * fp + 7) // 8) * 8
    bn = _block_n_fact(hfp)
    pad = (-n) % bn
    if pad:
        idx = jnp.concatenate([idx, jnp.zeros((l, nc, pad), idx.dtype)], -1)
        wgt = jnp.concatenate([wgt, jnp.zeros((l, nc, pad), wgt.dtype)], -1)
        cot = jnp.concatenate(
            [cot, jnp.zeros((pad, cot.shape[1]), cot.dtype)], 0
        )
    if rp > l * fp:
        cot = jnp.concatenate(
            [cot, jnp.zeros((cot.shape[0], rp - l * fp), cot.dtype)], 1
        )
    nb = idx.shape[2] // bn
    dpacked = pl.pallas_call(
        functools.partial(_bwd_kernel_fact_grouped, nc=nc, n_levels=l,
                          f_out=fp),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((l * nc, bn), lambda bb: (0, bb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l * nc, bn), lambda bb: (0, bb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, bn), lambda bb: (0, bb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_LANE, l * hfp), lambda bb: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_LANE, l * hfp), jnp.float32),
        interpret=_interpret(),
    )(idx.reshape(l * nc, -1), wgt.reshape(l * nc, -1), cot.T)
    # [128(lo), L*HF'] -> [L, 128, HF'] -> flat [rows, F']
    dtab_f = _unpack_grad_fact(
        spec_f,
        dpacked.reshape(_LANE, l, hfp).transpose(1, 0, 2),
    )
    return jnp.einsum(
        "rf,b->rbf", dtab_f, w, precision=jax.lax.Precision.HIGHEST
    ).reshape(dtab_f.shape[0], b * fp)


def _vjp_bwd_folded(spec, res, cot):
    x, w = res
    # w (a function of t) is never differentiated in this framework — NaN-
    # poison like the coordinates so a future t-grad caller fails loudly.
    return (_folded_table_bwd(spec, x, w, cot), _poison_coord_grad(x, cot),
            _poison_like(w, cot))


hash_encode_folded.defvjp(_vjp_fwd_folded, _vjp_bwd_folded)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def hash_encode_fact_multi_folded(spec: HashEncoderSpec, table, tables_ng,
                                  xs, ws):
    """Fused V-variant interpT-folded encode (the folded twin of
    hash_encode_fact_multi). ws: [V, B] per-variant Lagrange weights.
    Returns [V, N, L*F/B]; only variant 0's table is differentiable.
    """
    v, n = xs.shape[0], xs.shape[1]
    b = ws.shape[1]
    fp = spec.n_features // b
    spec_f = _folded_spec(spec, b)
    packs, idxs, wgts = [], [], []
    for vi in range(v):
        tab = table if vi == 0 else tables_ng[vi - 1]
        packs.append(
            _pack_table_fact(spec_f, _fold_table(tab, ws[vi], fp))
            .reshape(-1, _LANE)
        )
        i, wg = _prep(spec_f, xs[vi])
        idxs.append(i.reshape(-1, n))
        wgts.append(wg.reshape(-1, n))
    return _fwd_call_fact_grouped(
        spec_f, jnp.stack(packs), jnp.stack(idxs), jnp.stack(wgts), n
    )


def _vjp_fwd_multi_folded(spec, table, tables_ng, xs, ws):
    return hash_encode_fact_multi_folded(spec, table, tables_ng, xs, ws), (
        xs, ws, tables_ng.shape)


def _vjp_bwd_multi_folded(spec, res, cot):
    xs, ws, ng_shape = res
    # per-variant poison gates (see _vjp_bwd_multi)
    any_v = jnp.any(cot != 0.0, axis=(1, 2))  # [V]
    poison = jnp.where(any_v, jnp.nan, 0.0)
    return (
        _folded_table_bwd(spec, xs[0], ws[0], cot[0]),
        jnp.zeros(ng_shape, jnp.float32),
        (poison[:, None, None] * jnp.ones_like(xs)).astype(xs.dtype),
        (poison[:, None] * jnp.ones_like(ws)).astype(ws.dtype),
    )


hash_encode_fact_multi_folded.defvjp(_vjp_fwd_multi_folded,
                                     _vjp_bwd_multi_folded)


def folded_eligible(spec: HashEncoderSpec, num_basis, fact_max_rows=None):
    """The grouped folded kernel takes any F' (output rows are zero-padded
    to 8), but F must split evenly into basis chunks and the whole level
    stack must fit one VMEM block (all levels ride one grid step)."""
    if fact_max_rows is None:
        fact_max_rows = FACT_MAX_ROWS
    if spec.n_features % num_basis:
        return False
    if max(spec.table_sizes) > fact_max_rows:
        return False
    # rough VMEM bound for the single-block level stack: nc live one-hot
    # tiles (bf16) + step1 (f32) per level, all levels' SSA temps live
    fp = spec.n_features // num_basis
    hfp = (_r_max(spec) // _LANE) * fp
    bn = _block_n_fact(hfp)
    nc = 1 << spec.n_dims
    per_level = nc * _LANE * bn * 2 + hfp * nc * bn * 4
    return spec.n_levels * per_level <= 8 * 1024 * 1024


def hash_encode_interp_auto(spec: HashEncoderSpec, table, x, t, num_basis,
                            coord_grad=False):
    """interpT(encode(x), t) with auto dispatch: the folded one-hot sweep on
    TPU for eligible tables, else encode-then-interpT (bit-identical to the
    pre-fold formulation) on the gather/classic paths."""
    from lidar4d_tpu.ops.hash_enc import lagrange_time_interp, lagrange_weights

    if (not coord_grad and not _interpret() and ONEHOT_VARIANT == "fact"
            and folded_eligible(spec, num_basis)):
        return hash_encode_folded(spec, table, x,
                                  lagrange_weights(t, num_basis))
    g = hash_encode_auto(spec, table, x, coord_grad=coord_grad)
    return lagrange_time_interp(g, t, spec.n_levels, spec.n_features,
                                num_basis)


# Which one-hot kernel hash_encode_auto dispatches to. Measured v5e, 196k
# points, flagship specs (fwd ms, classic -> fact): static3d R=2048
# 25.5 -> 3.4, dyn2d R=2048 33.5 -> 3.8, flow3d 17.4 -> 2.8; at R=8192 the
# factorized kernel holds 8.2 ms where classic needs 84.8 and the gather
# path's backward 155.6. "classic" kept for A/B probes.
ONEHOT_VARIANT = "fact"
# The factorized kernel's VPU cost is R-independent; tables up to 2^14 rows
# stay MXU-bound, so its default eligibility window is wider than the
# classic kernel's 4096.
FACT_MAX_ROWS = 16384


def hash_encode_auto(spec: HashEncoderSpec, table, x, row_offset=None,
                     max_rows=4096, fact_max_rows=None, coord_grad=False):
    """Dispatch: one-hot MXU path for small tables, XLA gather otherwise.

    The MXU path only engages on real TPU — on CPU (tests, virtual meshes)
    pallas runs in interpret mode, which is far slower than the gather.

    max_rows bounds the CLASSIC one-hot kernel; fact_max_rows (default
    FACT_MAX_ROWS) independently bounds the factorized kernel, so a caller
    passing a tight max_rows to bound VMEM still controls both windows.
    Pass fact_max_rows=0 (with max_rows=0) to force the exact-f32 gather.

    coord_grad: the one-hot kernels NaN-POISON the coordinate cotangent
    (_poison_coord_grad): any graph that propagates d/dx through them turns
    NaN immediately instead of silently training with zero x-grads. They are
    therefore only correct when x carries no gradient (ray positions, or
    warped lookups under stop_gradient, models/lidar4d.py density()). A call
    site that needs d/dx MUST pass coord_grad=True to force the gather path,
    whose corner weights differentiate through autodiff — a forgotten flag
    fails loudly at the first training step, not in review.
    """
    from lidar4d_tpu.ops.hash_enc import hash_encode

    if fact_max_rows is None:
        fact_max_rows = FACT_MAX_ROWS
    if row_offset is None and not coord_grad and not _interpret():
        if ONEHOT_VARIANT == "fact" and onehot_eligible(spec, fact_max_rows):
            return hash_encode_onehot_fact(spec, table, x)
        if onehot_eligible(spec, max_rows):
            return hash_encode_onehot(spec, table, x)
    return hash_encode(spec, table, x, row_offset=row_offset)
