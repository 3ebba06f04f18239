"""Classic vs factorized one-hot hash kernel on the real chip.

Flagship shapes: static 3D (6 levels, R=2048), dynamic 2D (R=2048/1024),
flow 3D (4 levels, R=2048); N = 196k samples (1024 rays x 192).
"""

import time

import jax
import jax.numpy as jnp

from lidar4d_tpu.ops.hash_enc import HashEncoderSpec, hash_encode, init_hash_table
from lidar4d_tpu.ops.hash_onehot import (
    hash_encode_onehot,
    hash_encode_onehot_fact,
)


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=20):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 196_608
    specs = {
        "static3d_r2048": HashEncoderSpec(
            n_dims=3, n_levels=6, n_features=8, log2_hashmap_size=11,
            base_resolution=64, max_resolution=2048),
        "dyn2d_r2048": HashEncoderSpec(
            n_dims=2, n_levels=6, n_features=8, log2_hashmap_size=11,
            base_resolution=64, max_resolution=2048),
        "dyn2d_r1024": HashEncoderSpec(
            n_dims=2, n_levels=6, n_features=8, log2_hashmap_size=10,
            base_resolution=64, max_resolution=2048),
        "flow3d_r2048": HashEncoderSpec(
            n_dims=3, n_levels=4, n_features=8, log2_hashmap_size=11,
            base_resolution=16, max_resolution=256),
        # capacity-escalation probes: the fact kernel's VPU cost is
        # R-independent, only the MXU matmul grows with R
        "static3d_r8192": HashEncoderSpec(
            n_dims=3, n_levels=6, n_features=8, log2_hashmap_size=13,
            base_resolution=64, max_resolution=2048),
        "static3d_r16384": HashEncoderSpec(
            n_dims=3, n_levels=6, n_features=8, log2_hashmap_size=14,
            base_resolution=64, max_resolution=2048),
    }
    for name, spec in specs.items():
        table = init_hash_table(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (n, spec.n_dims))
        for kname, enc in (("classic", hash_encode_onehot),
                           ("fact", hash_encode_onehot_fact),
                           ("gather", hash_encode)):
            f = jax.jit(lambda t, enc=enc, spec=spec: enc(spec, t, x))
            tf = timeit(f, table)
            g = jax.jit(jax.grad(
                lambda t, enc=enc, spec=spec: jnp.sum(enc(spec, t, x))))
            tg = timeit(g, table)
            # parity vs gather
            err = float(jnp.max(jnp.abs(f(table) - hash_encode(spec, table, x))))
            print(f"{name} {kname}: fwd {tf:.1f} ms, fwd+bwd {tg:.1f} ms, "
                  f"maxerr {err:.1e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
