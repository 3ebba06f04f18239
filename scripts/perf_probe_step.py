"""Round-2 step-component breakdown on the real chip (flagship config)."""

import time

import jax
import jax.numpy as jnp

from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField


def sync(tree):
    return float(jnp.sum(jax.tree.leaves(tree)[0]))


def timeit(fn, *args, iters=10):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = LiDAR4DConfig(
        num_frames=51, near_lidar=0.01, far_lidar=0.81,
        n_levels_hash=6, n_features_per_level_hash=8,
        log2_hashmap_size=11, base_resolution=64, max_resolution=2048,
        hash_size_dynamic=(11, 10, 10),
        flow_n_levels=4, flow_n_features=8, flow_log2_hashmap_size=11,
        flow_base_resolution=16, flow_max_resolution=256,
        remat_density=False, density_chunk=0,
    )
    field = LiDAR4DField(cfg)
    params = field.init(jax.random.PRNGKey(0))
    n = 196_608
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), jnp.float32, -1, 1)
    x01 = (x + 1) / 2
    t = jnp.float32(0.5)

    probes = {
        "hash_static": lambda p: field.hash_encoder.forward_static(p["hash"], x01),
        "hash_dyn_x1": lambda p: field.hash_encoder.forward_dynamic(p["hash"], x01, t),
        "planes_static": lambda p: field.planes_encoder.forward_static(
            p["planes"],
            jnp.concatenate([x01, jnp.full((n, 1), 0.5)], -1)),
        "planes_dyn_x1": lambda p: field.planes_encoder.forward_dynamic_scalar_t(
            p["planes"], x01, t),
        "flow": lambda p: field.flow_net(p["flow"], x01, t),
        "density_full": lambda p: field.density(p, x, t)["sigma"],
    }
    for name, fn in probes.items():
        jfn = jax.jit(lambda p, fn=fn: fn(p))
        tf = timeit(jfn, params)
        g = jax.jit(jax.grad(lambda p, fn=fn: jnp.sum(
            jax.tree.leaves(fn(p))[0].astype(jnp.float32))))
        tg = timeit(lambda p: g(p)["hash"]["static"], params)
        print(f"{name}: fwd {tf:.1f} ms, fwd+bwd {tg:.1f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
