"""Bias-free ReLU MLPs as plain batched matmuls.

Replaces tiny-cuda-nn's FullyFusedMLP (`model/lidar4d.py:83-117`,
`model/flow_field.py:84-98`). On TPU a 64-wide MLP over ~786k samples per
step is a large, well-shaped matmul chain — the MXU handles it natively in
bfloat16; no hand fusion needed (XLA fuses the ReLUs into the matmuls).
Parameters are stored fp32, compute casts to `dtype` (bf16 by default) and
returns fp32 — mirroring the reference's fp16 AMP policy on CUDA.
"""

import jax
import jax.numpy as jnp


def init_mlp(key, dims, final_init_std=None):
    """He-uniform init for a bias-free MLP with layer dims [d0, d1, ..., dk].

    final_init_std: if set, last layer ~ N(0, std) (the reference's flow head
    init, flow_field.py:100).
    """
    params = []
    keys = jax.random.split(key, len(dims) - 1)
    for li, (fan_in, fan_out) in enumerate(zip(dims[:-1], dims[1:])):
        k = keys[li]
        last = li == len(dims) - 2
        if last and final_init_std is not None:
            w = final_init_std * jax.random.normal(k, (fan_in, fan_out), jnp.float32)
        else:
            bound = (6.0 / fan_in) ** 0.5
            w = jax.random.uniform(k, (fan_in, fan_out), jnp.float32, -bound, bound)
        params.append(w)
    return params


def apply_mlp(params, x, dtype=jnp.bfloat16):
    """Forward a bias-free ReLU MLP; hidden activations in `dtype`, output fp32."""
    h = x.astype(dtype)
    n = len(params)
    for li, w in enumerate(params):
        h = h @ w.astype(dtype)
        if li < n - 1:
            h = jax.nn.relu(h)
    return h.astype(jnp.float32)
