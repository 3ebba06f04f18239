"""4D decomposed hash encoder: static 3D grid + time-indexed 2D plane grids.

TPU-native re-design of the reference's `HashGrid4D` / `HashGridT`
(`model/hash_field.py:30-172`):

* the static xyz field is one multiresolution 3D hash grid;
* the dynamic field is three plane grids (xy·t, xz·t, yz·t); each plane owns
  `time_resolution` 2D hash grids whose tables are **stacked into one
  parameter array** so a traced time index selects the grid (no Python
  branching on t — one compiled graph covers all frames);
* lookups at time t linearly blend grids floor(idx)/ceil(idx)
  (hash_field.py:79-85) and then apply the Lagrange-basis feature
  interpolation "interpT" over num_basis feature chunks (hash_field.py:65-74).

Output dims with defaults: static 8x4 = 32, dynamic 3 x (8x4/4) = 24.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from lidar4d_tpu.ops.hash_enc import (
    HashEncoderSpec,
    init_hash_table,
    lagrange_weights,
)
from lidar4d_tpu.ops import hash_onehot
from lidar4d_tpu.ops.hash_onehot import (
    folded_eligible,
    hash_encode_auto,
    hash_encode_fact_multi_folded,
    hash_encode_interp_auto,
)

_PLANE_SELS = ((0, 1), (0, 2), (1, 2))  # xy, xz, yz


@dataclass(frozen=True)
class HashGrid4D:
    base_resolution: int = 512
    max_resolution: int = 32768
    time_resolution: int = 8
    n_levels: int = 8
    n_features_per_level: int = 4
    log2_hashmap_size: int = 19
    hash_size_dynamic: tuple = (15, 13, 13)  # xy gets the larger table
    num_basis: int = 4

    @property
    def static_spec(self) -> HashEncoderSpec:
        return HashEncoderSpec(
            n_dims=3,
            n_levels=self.n_levels,
            n_features=self.n_features_per_level,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            max_resolution=self.max_resolution,
        )

    def dynamic_spec(self, plane: int) -> HashEncoderSpec:
        return HashEncoderSpec(
            n_dims=2,
            n_levels=self.n_levels,
            n_features=self.n_features_per_level,
            log2_hashmap_size=self.hash_size_dynamic[plane],
            base_resolution=self.base_resolution,
            max_resolution=self.max_resolution,
        )

    @property
    def n_output_dims_static(self) -> int:
        return self.n_levels * self.n_features_per_level

    @property
    def n_output_dims_dynamic(self) -> int:
        return 3 * (self.n_levels * self.n_features_per_level // self.num_basis)

    @property
    def n_output_dims(self) -> int:
        return self.n_output_dims_static + self.n_output_dims_dynamic

    def init(self, key):
        ks = jax.random.split(key, 4)
        params = {"static": init_hash_table(ks[0], self.static_spec)}
        for p in range(3):
            params[f"dynamic_{p}"] = init_hash_table(
                ks[1 + p], self.dynamic_spec(p), n_grids=self.time_resolution
            )
        return params

    def forward_static(self, params, x):
        """x: [N, 3] in [0, 1] -> [N, L*F]."""
        return hash_encode_auto(self.static_spec, params["static"], x)

    def forward_dynamic(self, params, x, t):
        """x: [N, 3] in [0, 1], t: traced scalar in [0, 1] -> [N, 3*L*F/B].

        Parity with HashGridT.forward (hash_field.py:76-88): blend the two
        adjacent time grids, then Lagrange-interp feature chunks at t.
        Out-of-range t (from neighbor-frame queries at the sequence ends) is
        clamped at the grid-index level; the caller discards those branches.
        """
        t = jnp.asarray(t, jnp.float32)
        idx = jnp.clip(t, 0.0, 1.0) * (self.time_resolution - 1)
        i1 = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0, self.time_resolution - 1)
        i2 = jnp.clip(i1 + 1, 0, self.time_resolution - 1)
        w2 = idx - i1.astype(jnp.float32)

        x = jnp.clip(x, 0.0, 1.0)
        feats = []
        for p, sel in enumerate(_PLANE_SELS):
            spec = self.dynamic_spec(p)
            table = params[f"dynamic_{p}"]
            xy = x[:, sel]
            # Blend the TABLES, not the gathered features: the time blend is
            # linear, so one (R x F) elementwise blend (~10^5 elements)
            # replaces doubling the gather index set (~10^7 indices). Exactly
            # equivalent to gathering from both grids and blending.
            stack = table.reshape(self.time_resolution, spec.n_rows,
                                  spec.n_features)
            t1 = jax.lax.dynamic_index_in_dim(stack, i1, keepdims=False)
            t2 = jax.lax.dynamic_index_in_dim(stack, i2, keepdims=False)
            tab = (1.0 - w2) * t1 + w2 * t2
            feats.append(
                hash_encode_interp_auto(spec, tab, xy, t, self.num_basis)
            )
        return jnp.concatenate(feats, axis=-1)

    def forward_dynamic_multi(self, params, xs, ts, fused=None):
        """Fused dynamic encode of V time variants — ONE pallas sweep per plane.

        The density query's flow-warp aggregation (lidar4d.density,
        reference lidar4d.py:139-188) encodes (x, t) plus the two flow-warped
        neighbors (x+f, t+dt), (x+b, t-dt). Variant 0 is differentiable;
        variants 1..V-1 reproduce the reference's `with torch.no_grad()`
        neighbor lookups (lidar4d.py:160,169): their outputs are
        stop-gradiented here, so neither the tables nor the warped
        coordinates (-> flow net) receive gradient through them.

        Args:
          xs: [V, N, 3] in [0, 1] (variants may be flow-warped).
          ts: [V] scalar times; out-of-range values are clamped at the
            grid-index level exactly like forward_dynamic.
        Returns:
          [V, N, 3*L*F/B] — per-variant identical to forward_dynamic.
        """
        v = xs.shape[0]
        ts = jnp.asarray(ts, jnp.float32)
        if fused is None:  # auto: fused kernel on TPU for eligible tables
            fused = (
                hash_onehot.ONEHOT_VARIANT == "fact"
                and jax.default_backend() != "cpu"
                and all(
                    folded_eligible(self.dynamic_spec(p), self.num_basis)
                    for p in range(3)
                )
            )
        if not fused:
            outs = [self.forward_dynamic(params, xs[vi], ts[vi])
                    for vi in range(v)]
            outs = [outs[0]] + [jax.lax.stop_gradient(o) for o in outs[1:]]
            return jnp.stack(outs)

        idx = jnp.clip(ts, 0.0, 1.0) * (self.time_resolution - 1)     # [V]
        i1 = jnp.clip(jnp.floor(idx).astype(jnp.int32), 0,
                      self.time_resolution - 1)
        i2 = jnp.clip(i1 + 1, 0, self.time_resolution - 1)
        w2 = (idx - i1.astype(jnp.float32))[:, None, None]

        x = jnp.clip(xs, 0.0, 1.0)
        ws = lagrange_weights(ts, self.num_basis)            # [V, B]
        feats = []
        for p, sel in enumerate(_PLANE_SELS):
            spec = self.dynamic_spec(p)
            stack = params[f"dynamic_{p}"].reshape(
                self.time_resolution, spec.n_rows, spec.n_features
            )
            # per-variant table-space time blend (see forward_dynamic)
            tabs = (1.0 - w2) * jnp.take(stack, i1, axis=0) \
                + w2 * jnp.take(stack, i2, axis=0)          # [V, rows, F]
            # interpT folded into the blended tables: the pallas sweep runs
            # at F' = F/num_basis features (ops/hash_onehot.py rationale)
            g = hash_encode_fact_multi_folded(
                spec, tabs[0], tabs[1:], x[:, :, sel], ws
            )                                               # [V, N, L*F/B]
            feats.append(jnp.concatenate(
                [g[:1], jax.lax.stop_gradient(g[1:])], axis=0
            ))
        return jnp.concatenate(feats, axis=-1)

    def __call__(self, params, x, t):
        return self.forward_static(params, x), self.forward_dynamic(params, x, t)
