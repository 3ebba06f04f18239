"""Round-3 differential breakdown of the flagship train step.

Times (a) the full jitted step, (b) loss fwd-only, (c) render_rays
fwd+bwd without the loss tail, (d) density-only fwd+bwd at the step's
sample count — the pairwise differences attribute the step to
density / render machinery / losses+optimizer.
"""

import time

import jax
import jax.numpy as jnp

from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
from lidar4d_tpu.models.renderer import render_rays

NUM_RAYS = 1024
NC, NF = 128, 256


def sync(tree):
    return float(jnp.sum(jax.tree.leaves(tree)[0]))


def timeit(fn, *args, iters=5):
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
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    rays_o = jax.random.uniform(k1, (NUM_RAYS, 3), jnp.float32, -0.1, 0.1)
    rays_d = jax.random.normal(k2, (NUM_RAYS, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    t = jnp.float32(0.5)
    key = jax.random.PRNGKey(3)

    def render_loss(p):
        out = render_rays(field, p, rays_o, rays_d, t, key=key,
                          num_coarse=NC, num_fine=NF, perturb=True)
        return (jnp.sum(out["depth_lidar"] ** 2)
                + jnp.sum(out["image_lidar"] ** 2))

    ms = timeit(jax.jit(render_loss), params)
    print(f"render_rays fwd: {ms:.1f} ms", flush=True)
    ms = timeit(jax.jit(jax.grad(render_loss)), params)
    print(f"render_rays fwd+bwd: {ms:.1f} ms", flush=True)

    n = NUM_RAYS * (NC + NF)
    xyz = jax.random.uniform(jax.random.PRNGKey(4), (n, 3), jnp.float32, -1, 1)

    def dens_loss(p):
        d = field.density(p, xyz, t)
        return jnp.sum(d["sigma"]) + jnp.sum(d["geo_feat"] ** 2)

    ms = timeit(jax.jit(dens_loss), params)
    print(f"density {n} pts fwd: {ms:.1f} ms", flush=True)
    ms = timeit(jax.jit(jax.grad(dens_loss)), params)
    print(f"density {n} pts fwd+bwd: {ms:.1f} ms", flush=True)

    # coarse-pass-only density (the extra query at NC samples)
    nc_pts = NUM_RAYS * NC
    xyz_c = xyz[:nc_pts]

    def dens_c(p):
        d = field.density(p, xyz_c, t)
        return jnp.sum(d["sigma"]) + jnp.sum(d["geo_feat"] ** 2)

    ms = timeit(jax.jit(jax.grad(dens_c)), params)
    print(f"density {nc_pts} pts fwd+bwd: {ms:.1f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
