"""Real-chip validation of the r3 tail rewrites after the Precision.HIGHEST
fix (PERF.md: the flagship ep14 run NaN'd params through TPU's default bf16
matmul pass in the one-hot contractions).

Checks, on the TPU:
  1. sample_pdf (one-hot) == take_along_axis formulation, bitwise;
  2. merge_sorted (one-hot) == stable argsort, bitwise;
  3. 60 hierarchical train steps from scratch: finite losses AND finite
     params/mu/nu after.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_r3_fix.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), flush=True)
    from lidar4d_tpu.models.renderer import merge_sorted, sample_pdf

    n, c, s = 1024, 128, 256
    key = jax.random.PRNGKey(0)
    z = jnp.sort(jax.random.uniform(key, (n, c), minval=0.01, maxval=0.81),
                 axis=-1)
    w = jax.random.uniform(jax.random.PRNGKey(1), (n, c)) ** 8  # peaked
    k = jax.random.PRNGKey(2)

    def sample_pdf_gather(z_mid, weights, n_samples, key=None):
        nn, cc = weights.shape
        pdf = weights + 1e-5
        pdf = pdf / jnp.sum(pdf, axis=-1, keepdims=True)
        cdf = jnp.cumsum(pdf, axis=-1)
        cdf = jnp.concatenate([jnp.zeros((nn, 1), cdf.dtype), cdf], axis=-1)
        u = (jnp.arange(n_samples, dtype=jnp.float32) + 0.5) / n_samples
        u = jnp.broadcast_to(u, (nn, n_samples))
        if key is not None:
            u = u + (jax.random.uniform(key, (nn, n_samples)) - 0.5) / n_samples
            u = jnp.clip(u, 1e-6, 1.0 - 1e-6)
        below = jnp.sum(u[:, :, None] >= cdf[:, None, :], axis=-1) - 1
        below = jnp.clip(below, 0, cc - 1)
        cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
        cdf_hi = jnp.take_along_axis(cdf, below + 1, axis=-1)
        z_lo = jnp.take_along_axis(z_mid, below, axis=-1)
        z_hi = jnp.take_along_axis(z_mid, jnp.clip(below + 1, 0, cc - 1), axis=-1)
        denom = jnp.maximum(cdf_hi - cdf_lo, 1e-8)
        frac = (u - cdf_lo) / denom
        return z_lo + frac * (z_hi - z_lo)

    got = np.asarray(jax.jit(lambda z, w: sample_pdf(z, w, s, key=k))(z, w))
    want = np.asarray(jax.jit(lambda z, w: sample_pdf_gather(z, w, s, key=k))(z, w))
    d = np.abs(got - want).max()
    print(f"sample_pdf max|new-old| on chip: {d:.3e} "
          f"(range {got.min():.3f}..{got.max():.3f})", flush=True)
    assert d == 0.0, "sample_pdf NOT exact on TPU"
    assert got.min() >= 0.0 and got.max() <= 0.82, "sample_pdf out of range"

    zb = jnp.sort(jax.random.uniform(jax.random.PRNGKey(3), (n, s),
                                     minval=0.01, maxval=0.81), axis=-1)
    sig = jax.random.normal(jax.random.PRNGKey(4), (n, c + s))
    geo = jax.random.normal(jax.random.PRNGKey(5), (n, c + s, 15))

    def old_merge(za, zb, sig, geo):
        z_all = jnp.concatenate([za, zb], -1)
        order = jnp.argsort(z_all, axis=-1, stable=True)
        return (jnp.take_along_axis(z_all, order, axis=-1),
                jnp.take_along_axis(sig, order, axis=-1),
                jnp.take_along_axis(geo, order[..., None], axis=1))

    def new_merge(za, zb, sig, geo):
        zv, (s2, g2) = merge_sorted(za, zb, [sig, geo])
        return zv, s2, g2

    a = jax.jit(new_merge)(z, zb, sig, geo)
    b = jax.jit(old_merge)(z, zb, sig, geo)
    for name, x, y in zip("z sig geo".split(), a, b):
        dd = np.abs(np.asarray(x) - np.asarray(y)).max()
        print(f"merge {name} max|new-old| on chip: {dd:.3e}", flush=True)
        assert dd == 0.0, f"merge {name} NOT exact on TPU"

    # 3. short hierarchical train loop
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
                          num_frames=51, iters=2500)
    state, opt = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2,
                                  iters=2500)
    step = make_train_step(field, opt, loss_cfg, H=66, W=1030,
                           fov_lidar=(2.0, 26.9), num_rays=1024,
                           num_steps=768, patch_size=1,
                           num_coarse=128, num_fine=256)
    key = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    losses = []
    for i in range(60):
        key, kk = jax.random.split(key)
        frame = jax.tree.map(jnp.asarray, ds.frame(i % len(ds)))
        state, m = step(state, frame, cache, kk)
        if i in (0, 1, 10, 30, 59):
            losses.append((i, float(m["loss"])))
    dt = time.perf_counter() - t0
    print("hier losses:", losses, flush=True)
    assert all(np.isfinite(v) for _, v in losses), "NaN loss in hier steps"
    bad = [
        i for i, l in enumerate(jax.tree.leaves(state.params))
        if not np.isfinite(np.asarray(l)).all()
    ]
    mu = np.asarray(state.opt_state["adam"].mu)  # ScaleByAdamState
    nu = np.asarray(state.opt_state["adam"].nu)
    print(f"params nonfinite leaves: {bad}; mu finite {np.isfinite(mu).all()}"
          f"; nu finite {np.isfinite(nu).all()}", flush=True)
    assert not bad and np.isfinite(mu).all() and np.isfinite(nu).all()
    n_steps = 58  # exclude first two (compile)
    print(f"~step time (incl dispatch, 60 steps w/ compile): {dt:.1f}s total",
          flush=True)
    print("ALL CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
