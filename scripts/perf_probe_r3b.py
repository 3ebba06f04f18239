"""Round-3b probe: A/B the identical-numerics tail rewrites on the real chip.

sample_pdf one-hot lookups (vs take_along_axis) + merge_sorted (vs
argsort+take) + the full flagship step after both. Run:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r3b.py
"""

import time

import jax
import jax.numpy as jnp


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


def tail_probes():
    from lidar4d_tpu.models.renderer import merge_sorted, sample_pdf

    n, c, s = 1024, 128, 256
    key = jax.random.PRNGKey(0)
    za = jnp.sort(jax.random.uniform(key, (n, c)), axis=-1)
    w = jax.random.uniform(jax.random.PRNGKey(1), (n, c))
    k = jax.random.PRNGKey(2)

    sp = jax.jit(lambda z, w: sample_pdf(z, w, s, key=k))
    print(f"sample_pdf NEW 128->256: {timeit(sp, za, w):.1f} ms", flush=True)

    # merge A/B at the real shapes
    zb = jnp.sort(jax.random.uniform(jax.random.PRNGKey(3), (n, s)), axis=-1)
    sig = jax.random.normal(jax.random.PRNGKey(4), (n, c + s))
    geo = jax.random.normal(jax.random.PRNGKey(5), (n, c + s, 15))

    def merge_new(za, zb, sig, geo):
        z, (s2, g2) = merge_sorted(za, zb, [sig, geo])
        return z, s2, g2

    def merge_old(za, zb, sig, geo):
        z_all = jnp.concatenate([za, zb], -1)
        order = jnp.argsort(z_all, axis=-1)
        return (
            jnp.take_along_axis(z_all, order, axis=-1),
            jnp.take_along_axis(sig, order, axis=-1),
            jnp.take_along_axis(geo, order[..., None], axis=1),
        )

    print(f"merge NEW [1024,128+256]: "
          f"{timeit(jax.jit(merge_new), za, zb, sig, geo):.1f} ms", flush=True)
    print(f"merge OLD argsort+take: "
          f"{timeit(jax.jit(merge_old), za, zb, sig, geo):.1f} ms", flush=True)

    # bwd cost of the new merge (z, sigma, geo all carried)
    gm = jax.jit(jax.grad(lambda za, zb, sig, geo: sum(
        jnp.sum(x) for x in merge_new(za, zb, sig, geo))))
    print(f"merge NEW fwd+bwd: {timeit(gm, za, zb, sig, geo):.1f} ms",
          flush=True)


def step_probe():
    import bench
    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
    from lidar4d_tpu.train.losses import LossConfig
    from lidar4d_tpu.train.train_step import init_train_state, make_train_step

    ds, refine_ds, scale = bench.get_dataset()
    cache = jax.tree.map(jnp.asarray, bench.get_flow_cache(refine_ds, scale))

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
    step = make_train_step(field, opt, loss_cfg, H=66, W=1030,
                           fov_lidar=(2.0, 26.9), num_rays=1024,
                           num_steps=768, patch_size=1,
                           num_coarse=128, num_fine=256)
    ms = timeit(lambda s: step(s, frame, cache, key)[1]["loss"], state,
                iters=10)
    print(f"full step 128+256 AFTER tail rewrites: {ms:.1f} ms "
          f"({1024 / ms * 1000:.0f} rays/s)", flush=True)

    # density component split at 196k (matches PERF.md r2/r3 tables)
    n = 196_608
    x = jax.random.uniform(jax.random.PRNGKey(4), (n, 3), jnp.float32, -1, 1)
    x01 = (x + 1.0) / 2.0
    t = jnp.float32(0.5)
    params = state.params
    enc = field.hash_encoder
    pln = field.planes_encoder

    xs = jnp.stack([x01, x01 + 0.01, x01 - 0.01])
    ts = jnp.stack([t, t + 0.02, t - 0.02])

    probes = {
        "hash static": lambda p: enc.forward_static(p["hash"], x01),
        "hash dyn multi(3)": lambda p: enc.forward_dynamic_multi(
            p["hash"], xs, ts),
        "planes static": lambda p: pln.forward_static(
            p["planes"],
            jnp.concatenate([x01, jnp.full((n, 1), t)], axis=-1)),
        "planes dyn multi(3)": lambda p: pln.forward_dynamic_scalar_t_multi(
            p["planes"], xs, ts),
        "flow net": lambda p: field.flow_net(p["flow"], x01, t),
        "density full": lambda p: field.density(p, x, t)["sigma"],
    }
    for name, fn in probes.items():
        f_ms = timeit(jax.jit(lambda p, fn=fn: fn(p)), params, iters=5)
        g = jax.jit(jax.grad(
            lambda p, fn=fn: jnp.sum(jnp.asarray(fn(p)).astype(jnp.float32))))
        b_ms = timeit(lambda p, g=g: g(p)["sigma"], params, iters=5)
        print(f"density comp {name} 196k: {f_ms:.1f} / {b_ms:.1f} ms",
              flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    tail_probes()
    step_probe()
    print("done", flush=True)
