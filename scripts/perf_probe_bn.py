"""Block-size tuning probe for the one-hot kernels (plane + hash)."""

import time

import jax
import jax.numpy as jnp

import lidar4d_tpu.ops.hash_onehot as ho
import lidar4d_tpu.ops.plane_onehot as po
from lidar4d_tpu.ops.hash_enc import HashEncoderSpec


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=10):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    n = 196_608
    print("backend:", jax.default_backend(), flush=True)

    for h, w in [(256, 256), (8, 256)]:
        kg, kp = jax.random.split(jax.random.PRNGKey(1))
        grid = jax.random.normal(kg, (3, 8, h, w), jnp.float32)
        pts = jax.random.uniform(kp, (3, n, 2), jnp.float32)
        cot = jnp.ones((3, 8, n), jnp.float32)
        for bn in (512, 1024):
            po._BN = bn
            f = jax.jit(po.plane_bilinear)
            g = jax.jit(jax.grad(
                lambda gr, p: jnp.sum(po.plane_bilinear(gr, p) * cot),
                argnums=(0, 1)))
            tf = timeit(f, grid, pts)
            tg = timeit(lambda a, b: g(a, b)[0], grid, pts)
            print(f"plane [{h}x{w}] BN={bn}: fwd {tf:.1f} ms, fwd+bwd {tg:.1f} ms",
                  flush=True)

    # hash one-hot: flagship dynamic spec (2D, 6 levels, R=2048)
    spec = HashEncoderSpec(n_dims=2, n_levels=6, n_features=8,
                           log2_hashmap_size=11, base_resolution=64,
                           max_resolution=2048)
    kt, kx = jax.random.split(jax.random.PRNGKey(2))
    table = jax.random.normal(kt, (spec.n_rows, 8), jnp.float32) * 1e-2
    x = jax.random.uniform(kx, (n, 2), jnp.float32)
    cot = jnp.ones((n, spec.n_output_dims), jnp.float32)
    orig = ho._block_n
    for bn in (512, 1024, 2048):
        ho._block_n = lambda r, b=bn: b
        f = jax.jit(lambda t, xx: ho.hash_encode_onehot(spec, t, xx))
        g = jax.jit(jax.grad(
            lambda t, xx: jnp.sum(ho.hash_encode_onehot(spec, t, xx) * cot)))
        tf = timeit(f, table, x)
        tg = timeit(g, table, x)
        print(f"hash2d R=2048 BN={bn}: fwd {tf:.1f} ms, fwd+bwd {tg:.1f} ms",
              flush=True)
    ho._block_n = orig

    # 3D static flagship spec (R=2048, 8 corners)
    spec3 = HashEncoderSpec(n_dims=3, n_levels=6, n_features=8,
                            log2_hashmap_size=11, base_resolution=64,
                            max_resolution=2048)
    table3 = jax.random.normal(kt, (spec3.n_rows, 8), jnp.float32) * 1e-2
    x3 = jax.random.uniform(kx, (n, 3), jnp.float32)
    cot3 = jnp.ones((n, spec3.n_output_dims), jnp.float32)
    for bn in (512, 1024, 2048):
        ho._block_n = lambda r, b=bn: b
        f = jax.jit(lambda t, xx: ho.hash_encode_onehot(spec3, t, xx))
        g = jax.jit(jax.grad(
            lambda t, xx: jnp.sum(ho.hash_encode_onehot(spec3, t, xx) * cot3)))
        tf = timeit(f, table3, x3)
        tg = timeit(g, table3, x3)
        print(f"hash3d R=2048 BN={bn}: fwd {tf:.1f} ms, fwd+bwd {tg:.1f} ms",
              flush=True)
    ho._block_n = orig
    print("done", flush=True)


if __name__ == "__main__":
    main()
