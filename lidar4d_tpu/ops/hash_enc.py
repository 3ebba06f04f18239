"""Multiresolution hash-grid encoding (Instant-NGP style) in pure JAX.

TPU-native replacement for the tiny-cuda-nn "HashGrid" encoding the reference
uses everywhere (`model/hash_field.py:47-57,107-117`, `model/flow_field.py:67-77`).
This is a re-design, not a port: per-level tables are concatenated into a single
flat [rows, F] parameter array; all corner gathers lower to XLA dynamic-gathers,
corner accumulation is unrolled statically (8 gathers of [N, L, F]) so no
[N, L, 2^d, F] intermediate is materialized, and callers wrap the encode in
`jax.checkpoint` so the backward pass recomputes indices/weights instead of
storing them.

Levels whose dense vertex grid fits in the hashmap budget use direct (strided)
indexing; larger levels use the NGP spatial hash
    h(v) = (v_0 * 1) xor (v_1 * 2654435761) xor (v_2 * 805459861)  mod T
with T a power of two — matching tiny-cuda-nn's collision behavior class.

Supports a `row_offset` so a stack of grids (e.g. the reference's
`HashGridT` time-indexed grids, `hash_field.py:44-59`) lives in one table and
a traced time index selects the grid — one compiled graph covers all frames.
"""

from dataclasses import dataclass, field
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# NGP spatial-hash primes (first coordinate is un-multiplied).
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashEncoderSpec:
    """Static configuration of a multiresolution hash encoder."""

    n_dims: int = 3
    n_levels: int = 8
    n_features: int = 4
    log2_hashmap_size: int = 19
    base_resolution: int = 512
    max_resolution: int = 32768

    @property
    def per_level_scale(self) -> float:
        if self.n_levels == 1:
            return 1.0
        return float(
            np.exp2(np.log2(self.max_resolution / self.base_resolution) / (self.n_levels - 1))
        )

    @property
    def resolutions(self):
        s = self.per_level_scale
        return tuple(
            int(np.round(self.base_resolution * (s ** l))) for l in range(self.n_levels)
        )

    @property
    def table_sizes(self):
        """Rows per level: dense size if the vertex grid fits, else 2^log2."""
        cap = 1 << self.log2_hashmap_size
        sizes = []
        for res in self.resolutions:
            dense = (res + 1) ** self.n_dims
            sizes.append(dense if dense <= cap else cap)
        return tuple(sizes)

    @property
    def level_offsets(self):
        offs, acc = [], 0
        for s in self.table_sizes:
            offs.append(acc)
            acc += s
        return tuple(offs)

    @property
    def n_rows(self) -> int:
        return sum(self.table_sizes)

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features


def init_hash_table(key, spec: HashEncoderSpec, n_grids: int = 1, scale: float = 1e-4):
    """Uniform(-scale, scale) init, matching tiny-cuda-nn's default table init.

    Returns [n_grids * n_rows, F] (n_grids > 1 stacks e.g. time-indexed grids).
    """
    shape = (n_grids * spec.n_rows, spec.n_features)
    return jax.random.uniform(key, shape, jnp.float32, -scale, scale)


def _level_indices(spec: HashEncoderSpec, x, level: int):
    """Corner indices + interp weights for one level.

    Args:
      x: [N, d] in [0, 1].
    Returns:
      idx:  list of 2^d int32 [N] flat row indices (level offset included)
      wgt:  list of 2^d float32 [N] trilinear/bilinear weights
    """
    d = spec.n_dims
    res = spec.resolutions[level]
    size = spec.table_sizes[level]
    off = spec.level_offsets[level]
    dense = size == (res + 1) ** d

    pos = x.astype(jnp.float32) * res
    x0 = jnp.floor(pos)
    frac = pos - x0
    x0 = x0.astype(jnp.int32)

    idxs, wgts = [], []
    for corner in range(1 << d):
        bits = [(corner >> k) & 1 for k in range(d)]
        cpos = jnp.clip(x0 + jnp.asarray(bits, jnp.int32), 0, res)  # [N, d]
        if dense:
            stride = 1
            flat = jnp.zeros(cpos.shape[:1], jnp.int32)
            for k in range(d):
                flat = flat + cpos[:, k] * stride
                stride *= res + 1
        else:
            acc = cpos[:, 0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
            for k in range(1, d):
                acc = jnp.bitwise_xor(
                    acc, cpos[:, k].astype(jnp.uint32) * jnp.uint32(_PRIMES[k])
                )
            flat = (acc & jnp.uint32(size - 1)).astype(jnp.int32)
        w = jnp.ones(cpos.shape[:1], jnp.float32)
        for k in range(d):
            w = w * (frac[:, k] if bits[k] else 1.0 - frac[:, k])
        idxs.append(off + flat)
        wgts.append(w)
    return idxs, wgts


def hash_encode(spec: HashEncoderSpec, table, x, row_offset=None):
    """Encode points with a multiresolution hash grid.

    Args:
      spec:       static encoder config.
      table:      [rows, F] (or [n_grids * n_rows, F]) parameter table.
      x:          [N, d] coordinates in [0, 1].
      row_offset: optional traced int32 scalar added to all row indices
                  (selects one grid out of a stack of n_grids).

    Returns:
      [N, L * F] float32 features.

    All L x 2^d corner lookups are batched into ONE gather: XLA's TPU gather
    emitter amortizes per-op overhead over the full 50M-row index set, which
    is decisively faster than the naive per-level/per-corner `take` chain
    (Mosaic has no large-table row-gather primitive, so this is the
    TPU-native formulation — see tpu.dynamic_gather's take_along_axis-only
    support in pallas/mosaic/lowering.py).
    """
    n = x.shape[0]
    n_corners = 1 << spec.n_dims
    idx_all, wgt_all = [], []
    for level in range(spec.n_levels):
        idxs, wgts = _level_indices(spec, x, level)
        idx_all.extend(idxs)
        wgt_all.extend(wgts)
    idx = jnp.stack(idx_all)  # [L * C, N]
    wgt = jnp.stack(wgt_all)  # [L * C, N]
    if row_offset is not None:
        idx = idx + row_offset
    # gather along axis 1 of the transposed table: the result's LAST dim is
    # the huge one, so the (8, 128) TPU tile layout doesn't pad the tiny
    # feature dim 128-wide (a [M, F<8] gather output would cost 16-32x its
    # logical size in HBM)
    g = jnp.take(table.T, idx.reshape(-1), axis=1)  # [F, L*C*N]
    g = g.reshape(spec.n_features, spec.n_levels, n_corners, n)
    acc = jnp.sum(g * wgt.reshape(1, spec.n_levels, n_corners, n), axis=2)
    return acc.transpose(2, 1, 0).reshape(n, spec.n_levels * spec.n_features)


def hash_encode_blend(spec: HashEncoderSpec, table, x, row_offsets, blend):
    """Blend of K grid lookups sharing corner indices, in ONE gather.

    Used for the time-indexed grid stacks (HashGridT, hash_field.py:79-85):
    the K grids (e.g. floor/ceil time grids) see the same spatial corner
    indices, so the K x L x 2^d lookups batch into a single `take` and the
    per-grid blend happens on the gathered values.

    Args:
      table:       [n_grids * n_rows, F] stacked grids.
      row_offsets: [K] traced int32 row offsets (grid_index * n_rows).
      blend:       [K] traced float32 blend weights.

    Returns [N, L * F].
    """
    n = x.shape[0]
    k = row_offsets.shape[0]
    n_corners = 1 << spec.n_dims
    idx_all, wgt_all = [], []
    for level in range(spec.n_levels):
        idxs, wgts = _level_indices(spec, x, level)
        idx_all.extend(idxs)
        wgt_all.extend(wgts)
    idx = jnp.stack(idx_all)  # [L * C, N]
    wgt = jnp.stack(wgt_all)  # [L * C, N]
    idx_k = idx[None, :, :] + row_offsets[:, None, None]  # [K, L*C, N]
    # transposed gather: see hash_encode for the tile-padding rationale
    g = jnp.take(table.T, idx_k.reshape(-1), axis=1)
    g = g.reshape(spec.n_features, k, spec.n_levels * n_corners, n)
    g = jnp.sum(g * blend[None, :, None, None], axis=1)  # [F, L*C, N]
    g = g.reshape(spec.n_features, spec.n_levels, n_corners, n)
    acc = jnp.sum(g * wgt.reshape(1, spec.n_levels, n_corners, n), axis=2)
    return acc.transpose(2, 1, 0).reshape(n, spec.n_levels * spec.n_features)


@lru_cache(maxsize=None)
def _lagrange_coeff_matrix(num_basis: int):
    """Static part of the Lagrange basis over nodes T = [0, 1/(B-1), ..., 1]."""
    nodes = np.array([i / (num_basis - 1) for i in range(num_basis)])
    return nodes


def lagrange_weights(t, num_basis=4):
    """Lagrange basis weights at time(s) t over nodes T = [0, 1/(B-1), .., 1].

    t: scalar or [...]-shaped; returns [..., num_basis] float32.
    """
    nodes = _lagrange_coeff_matrix(num_basis)
    t = jnp.asarray(t, jnp.float32)
    weights = []
    for j in range(num_basis):
        w = jnp.ones_like(t)
        for m in range(num_basis):
            if m == j:
                continue
            w = w * (t - nodes[m]) / (nodes[j] - nodes[m])
        weights.append(w)
    return jnp.stack(weights, axis=-1)


def lagrange_time_interp(feats, t, n_levels, n_features, num_basis=4):
    """Temporal Lagrange interpolation over feature chunks ("interpT").

    Parity with `model/hash_field.py:65-74` / `model/flow_field.py:102-111`:
    features [N, L*F] are viewed as [N, L, F], chunked into `num_basis` groups
    along F, and blended with the Lagrange basis polynomials at nodes
    T = [0, 1/(B-1), ..., 1] evaluated at scalar time t.

    Returns [N, L * F / num_basis].
    """
    n = feats.shape[0]
    f_chunk = n_features // num_basis
    x = feats.reshape(n, n_levels, num_basis, f_chunk)
    w = lagrange_weights(t, num_basis)  # [B]
    out = jnp.einsum("nlbf,b->nlf", x, w)
    return out.reshape(n, n_levels * f_chunk)
