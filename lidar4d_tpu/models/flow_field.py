"""Scene-flow field: hash-grid features + small bias-free MLP.

TPU-native re-design of the reference's `FlowField`
(`model/flow_field.py:40-130`): a 3D multiresolution hash grid (8 levels x 8
features, 32 -> 8192, 2^18 table) whose features pass through the same
Lagrange "interpT" chunk interpolation at time t, then a 3-layer 64-wide
bias-free MLP -> 6 outputs (forward + backward flow). The last layer is
initialized N(0, 0.001) so flow starts near zero (flow_field.py:100).

Optional frequency embedding (off by default, flow_field.py:16-37) is kept
for CLI parity.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lidar4d_tpu.ops.hash_enc import HashEncoderSpec, init_hash_table
from lidar4d_tpu.ops.hash_onehot import hash_encode_interp_auto
from lidar4d_tpu.ops.mlp import apply_mlp, init_mlp


def freq_embed(x, num_freqs=6, linspace=True):
    """FreqEmbed (flow_field.py:16-37): sin/cos of linearly spaced frequencies."""
    if linspace:
        freqs = np.linspace(1, num_freqs + 1, num_freqs)
    else:
        freqs = 2.0 ** np.linspace(0, num_freqs - 1, num_freqs)
    outs = []
    for fn in (jnp.sin, jnp.cos):
        for f in freqs:
            outs.append(fn(f * x * jnp.pi))
    return jnp.concatenate(outs, axis=-1)


@dataclass(frozen=True)
class FlowField:
    input_dim: int = 4
    num_layers: int = 3
    hidden_dim: int = 64
    use_freq: bool = False
    num_freqs: int = 6
    use_grid: bool = True
    num_basis: int = 4
    n_levels: int = 8
    n_features_per_level: int = 8
    base_resolution: int = 32
    max_resolution: int = 8192
    log2_hashmap_size: int = 18

    @property
    def grid_spec(self) -> HashEncoderSpec:
        return HashEncoderSpec(
            n_dims=3,
            n_levels=self.n_levels,
            n_features=self.n_features_per_level,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            max_resolution=self.max_resolution,
        )

    @property
    def mlp_input_dim(self) -> int:
        dim = 0
        if self.use_freq:
            dim += self.input_dim * self.num_freqs * 2
        if self.use_grid:
            dim += self.n_levels * self.n_features_per_level // self.num_basis
        return dim

    def init(self, key):
        k1, k2 = jax.random.split(key)
        dims = (
            [self.mlp_input_dim]
            + [self.hidden_dim] * (self.num_layers - 1)
            + [6]
        )
        params = {"mlp": init_mlp(k2, dims, final_init_std=0.001)}
        if self.use_grid:
            params["grid"] = init_hash_table(k1, self.grid_spec)
        return params

    def __call__(self, params, x, t):
        """x: [N, 3] in [0, 1]; t: traced scalar. Returns [N, 6] flow."""
        h = []
        if self.use_freq:
            t_col = jnp.full((x.shape[0], 1), t, x.dtype)
            h.append(freq_embed(jnp.concatenate([x, t_col], -1), self.num_freqs))
        if self.use_grid:
            # interpT folded into the table on the one-hot path (the basis
            # contraction commutes with the encode — ops/hash_onehot.py);
            # gather/CPU paths keep encode-then-interpT bit-identically
            g = hash_encode_interp_auto(
                self.grid_spec, params["grid"], jnp.clip(x, 0.0, 1.0), t,
                self.num_basis,
            )
            h.append(g)
        h = jnp.concatenate(h, axis=-1)
        return apply_mlp(params["mlp"], h)
