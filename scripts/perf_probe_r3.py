"""Round-3 probes: parity-path scatter wall + flagship 128+256 step breakdown.

Run on the real chip (one process = one axon claim):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r3.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaves = jax.tree.leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:8]))


def timeit(fn, *args, iters=5):
    sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def scatter_probes():
    """The parity-architecture backward wall: scatter-add into 2^19-row tables."""
    rows, f, n = 1 << 19, 4, 50_000_000
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n,), 0, rows, jnp.int32)
    vals = jax.random.normal(jax.random.PRNGKey(1), (f, n), jnp.float32)
    tab = jnp.zeros((f, rows), jnp.float32)

    def plain(tab, idx, vals):
        return tab.at[:, idx].add(vals)

    def sorted_hint(tab, idx, vals):
        order = jnp.argsort(idx)
        si = idx[order]
        sv = vals[:, order]
        return tab.at[:, si].add(sv, indices_are_sorted=True)

    def seg_sum(tab, idx, vals):
        order = jnp.argsort(idx)
        si = idx[order]
        sv = vals[:, order]
        out = jax.vmap(
            lambda v: jax.ops.segment_sum(
                v, si, num_segments=rows, indices_are_sorted=True
            )
        )(sv)
        return tab + out

    for name, fn in [("scatter_plain", plain), ("scatter_sorted", sorted_hint),
                     ("scatter_segsum", seg_sum)]:
        try:
            ms = timeit(jax.jit(fn), tab, idx, vals, iters=3)
            print(f"{name} 50M->2^19x4: {ms:.1f} ms ({ms * 1e6 / n:.1f} ns/upd)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # gather fwd reference point
    def gather(tab, idx):
        return jnp.take(tab, idx, axis=1)

    ms = timeit(jax.jit(gather), tab, idx, iters=3)
    print(f"gather 50M from 2^19x4: {ms:.1f} ms ({ms * 1e6 / n:.1f} ns/idx)",
          flush=True)

    # smaller index count (the per-level reality is ~6M/level at 786k pts)
    n2 = 6_000_000
    idx2, vals2 = idx[:n2], vals[:, :n2]
    for name, fn in [("scatter_plain", plain), ("scatter_segsum", seg_sum)]:
        ms = timeit(jax.jit(fn), tab, idx2, vals2, iters=3)
        print(f"{name} 6M->2^19x4: {ms:.1f} ms ({ms * 1e6 / n2:.1f} ns/upd)",
              flush=True)


def parity_probes():
    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField

    cfg = LiDAR4DConfig(num_frames=51, near_lidar=0.01, far_lidar=0.81)
    field = LiDAR4DField(cfg)
    params = field.init(jax.random.PRNGKey(0))
    n = 786_432  # 1024 rays x 768 samples
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), jnp.float32, -1, 1)
    t = jnp.float32(0.5)

    fwd = jax.jit(lambda p: field.density(p, x, t)["sigma"])
    tf = timeit(fwd, params, iters=2)
    print(f"parity density fwd 786k: {tf:.0f} ms", flush=True)

    # chunked+remat like the real step
    from lidar4d_tpu.models.renderer import _query_density
    rays_o = jnp.zeros((1024, 3), jnp.float32)
    rays_d = jax.random.normal(jax.random.PRNGKey(2), (1024, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z = jnp.broadcast_to(jnp.linspace(0.01, 0.81, 768), (1024, 768))

    def dens_loss(p):
        sig, geo = _query_density(field, p, rays_o, rays_d, z, t, 1.0)
        return jnp.sum(sig) + jnp.sum(geo)

    g = jax.jit(jax.grad(dens_loss))
    tg = timeit(lambda p: g(p)["hash"]["static"], params, iters=2)
    print(f"parity density fwd+bwd (chunk+remat) 786k: {tg:.0f} ms", flush=True)


def flagship_probes():
    import bench
    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
    from lidar4d_tpu.models.renderer import render_rays
    from lidar4d_tpu.train.losses import LossConfig
    from lidar4d_tpu.train.train_step import init_train_state, make_train_step

    ds, refine_ds, scale = bench.get_dataset()
    cache = jax.tree.map(jnp.asarray, bench.get_flow_cache(refine_ds, scale))
    print("cloud shapes:", {k: v.shape for k, v in cache.items()}, flush=True)

    cfg = LiDAR4DConfig(
        num_frames=51, near_lidar=1.0 * scale, far_lidar=81.0 * scale,
        n_levels_hash=6, n_features_per_level_hash=8,
        log2_hashmap_size=11, base_resolution=64, max_resolution=2048,
        hash_size_dynamic=(11, 10, 10),
        flow_n_levels=4, flow_n_features=8, flow_log2_hashmap_size=11,
        flow_base_resolution=16, flow_max_resolution=256,
        remat_density=False, density_chunk=0,
    )
    field = LiDAR4DField(cfg)
    loss_cfg = LossConfig(flow_loss=True, grad_loss=True, scale=scale,
                          num_frames=51, iters=30000)
    state, opt = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2,
                                  iters=30000)
    frame = jax.tree.map(jnp.asarray, ds.frame(0))
    key = jax.random.PRNGKey(1)

    # 1. full step
    step = make_train_step(field, opt, loss_cfg, H=66, W=1030,
                           fov_lidar=(2.0, 26.9), num_rays=1024,
                           num_steps=768, patch_size=1,
                           num_coarse=128, num_fine=256)

    def run_step(s):
        s2, m = step(s, frame, cache, key)
        return m["loss"]

    ms_full = timeit(run_step, state, iters=5)
    print(f"full step 128+256: {ms_full:.1f} ms", flush=True)

    # 2. step without flow loss
    loss_cfg_nf = LossConfig(flow_loss=False, grad_loss=True, scale=scale,
                             num_frames=51, iters=30000)
    step_nf = make_train_step(field, opt, loss_cfg_nf, H=66, W=1030,
                              fov_lidar=(2.0, 26.9), num_rays=1024,
                              num_steps=768, patch_size=1,
                              num_coarse=128, num_fine=256)
    ms_nf = timeit(lambda s: step_nf(s, frame, cache, key)[1]["loss"],
                   state, iters=5)
    print(f"step no-flow-loss: {ms_nf:.1f} ms (flow loss = "
          f"{ms_full - ms_nf:.1f} ms)", flush=True)

    # 3. render-only fwd+bwd (no losses/optimizer)
    rays_d = jax.random.normal(jax.random.PRNGKey(2), (1024, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.zeros((1024, 3), jnp.float32)
    t = jnp.float32(0.5)
    k = jax.random.PRNGKey(3)

    def render_loss(p):
        out = render_rays(field, p, rays_o, rays_d, t, key=k,
                          num_steps=768, perturb=True, with_aux=True,
                          num_coarse=128, num_fine=256)
        return (jnp.sum(out["depth_lidar"]) + jnp.sum(out["image_lidar"])
                + jnp.sum(out["weights"]))

    gr = jax.jit(jax.grad(render_loss))
    ms_r = timeit(lambda p: gr(p)["hash"]["static"], state.params, iters=5)
    print(f"render fwd+bwd only: {ms_r:.1f} ms", flush=True)

    # 4. density coarse/fine fwd+bwd
    n_c, n_f = 131_072, 262_144
    for nm, n in [("coarse", n_c), ("fine", n_f), ("combined", n_c + n_f)]:
        x = jax.random.uniform(jax.random.PRNGKey(4), (n, 3), jnp.float32,
                               -1, 1)
        gd = jax.jit(jax.grad(
            lambda p, x=x: jnp.sum(field.density(p, x, t)["sigma"])))
        ms = timeit(lambda p, gd=gd: gd(p)["hash"]["static"], state.params,
                    iters=5)
        print(f"density fwd+bwd {nm} ({n}): {ms:.1f} ms", flush=True)

    # 5. argsort merge cost at [1024, 384]
    za = jax.random.uniform(jax.random.PRNGKey(5), (1024, 384))
    geo = jax.random.normal(jax.random.PRNGKey(6), (1024, 384, 15))

    def sort_take(z, g):
        order = jnp.argsort(z, axis=-1)
        zs = jnp.take_along_axis(z, order, axis=-1)
        gs = jnp.take_along_axis(g, order[..., None], axis=1)
        return zs, gs

    ms = timeit(jax.jit(sort_take), za, geo, iters=5)
    print(f"argsort+take [1024,384](+geo15): {ms:.1f} ms", flush=True)

    # 6. attribute fwd+bwd at 393k
    x = jax.random.normal(jax.random.PRNGKey(7), (393_216, 3))
    gf = jax.random.normal(jax.random.PRNGKey(8), (393_216, 15))
    ga = jax.jit(jax.grad(
        lambda p: jnp.sum(field.attribute(p, x, gf))))
    ms = timeit(lambda p: ga(p)["intensity"], state.params, iters=5)
    print(f"attribute fwd+bwd 393k: {ms:.1f} ms", flush=True)

    # 7. optimizer-only cost
    grads = jax.tree.map(jnp.zeros_like, state.params)

    @jax.jit
    def opt_only(s, g):
        updates, os2 = opt.update(g, s.opt_state, s.params)
        import optax
        return optax.apply_updates(s.params, updates)

    ms = timeit(lambda s: opt_only(s, grads)["sigma"], state, iters=5)
    print(f"optimizer only: {ms:.1f} ms", flush=True)

    # 8. sample_pdf cost
    from lidar4d_tpu.models.renderer import sample_pdf
    w = jax.random.uniform(jax.random.PRNGKey(9), (1024, 128))
    sp = jax.jit(lambda z, w: sample_pdf(z, w, 256, key=k))
    ms = timeit(sp, za[:, :128], w, iters=5)
    print(f"sample_pdf 128->256: {ms:.1f} ms", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    print("=== scatter/gather microbench ===", flush=True)
    scatter_probes()
    print("=== flagship breakdown ===", flush=True)
    flagship_probes()
    print("=== parity density ===", flush=True)
    parity_probes()
    print("done", flush=True)
