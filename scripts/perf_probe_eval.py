"""Round-3 eval-render attribution on the real chip (flagship config).

Eval epochs cost ~120 s/10 frames in render (PERF.md); training fwd+bwd
moves ~2.3M samples/s, so a fwd-only frame render (26M samples) "should"
take ~4-5 s. This probe times render_staged at several chunk sizes plus
the one-frame components to find where the rest goes.
"""

import time

import jax
import jax.numpy as jnp

from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
from lidar4d_tpu.models.renderer import render_rays, render_staged

H, W = 66, 1030


def sync(tree):
    leaves = jax.tree.leaves(tree)
    return float(jnp.sum(leaves[0]))


def timeit(fn, *args, iters=3):
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
    n = H * W
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    rays_o = jax.random.uniform(k1, (n, 3), jnp.float32, -0.1, 0.1)
    rays_d = jax.random.normal(k2, (n, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = jnp.float32(0.5)

    for chunk in (4096, 16384, 65536):
        ms = timeit(
            lambda p, c=chunk: render_staged(
                field, p, rays_o, rays_d, t, chunk=c,
                num_coarse=128, num_fine=256,
            )["depth_lidar"],
            params,
        )
        print(f"render_staged chunk={chunk}: {ms:.0f} ms/frame", flush=True)

    # unstaged single batch of 16384 rays: the per-chunk cost floor
    ro, rd = rays_o[:16384], rays_d[:16384]
    jfull = jax.jit(lambda p: render_rays(
        field, p, ro, rd, t, num_coarse=128, num_fine=256,
        with_aux=False)["depth_lidar"])
    print(f"render_rays 16384 rays: {timeit(jfull, params):.0f} ms", flush=True)

    # density-only at the same sample count (16384 x 384)
    xyz = jax.random.uniform(jax.random.PRNGKey(3), (16384 * 384, 3),
                             jnp.float32, -1, 1)
    jd = jax.jit(lambda p: field.density(p, xyz, t)["sigma"])
    print(f"density 6.3M pts: {timeit(jd, params):.0f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
