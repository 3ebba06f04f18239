"""Real-chip validation of the r4 interpT-folded one-hot kernels.

The r3 incident (PERF.md) proved CPU tests cannot catch TPU-only numerics:
validate every new exact-rewrite kernel ON THE CHIP before a training run.

Checks:
  1. hash_encode_folded == lagrange_time_interp(gather encode) on the chip
     at flagship specs (bf16 kernel tolerance, same bound as the unfolded
     kernel's);
  2. hash_encode_fact_multi_folded per-variant == hash_encode_folded;
  3. folded vs unfolded fused path: forward_dynamic_multi values + variant-0
     table grads agree within the pre-existing bf16 bound;
  4. 40 hierarchical train steps from scratch (flagship config): finite
     losses AND finite params/mu/nu after; step timing printed.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_r4_fold.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def check(name, got, want, tol):
    got, want = np.asarray(got), np.asarray(want)
    scale = max(np.abs(want).max(), 1e-6)
    d = np.abs(got - want).max() / scale
    print(f"{name}: rel max diff {d:.3e} (tol {tol})", flush=True)
    assert d <= tol, f"{name} off by {d}"


def main():
    print("backend:", jax.default_backend(), flush=True)
    from lidar4d_tpu.models.hash_field import HashGrid4D
    from lidar4d_tpu.ops.hash_enc import (
        HashEncoderSpec,
        hash_encode,
        init_hash_table,
        lagrange_time_interp,
        lagrange_weights,
    )
    from lidar4d_tpu.ops.hash_onehot import (
        hash_encode_fact_multi_folded,
        hash_encode_folded,
    )

    n = 196608
    # flagship dyn plane (2D) and flow (3D) specs
    spec2 = HashEncoderSpec(n_dims=2, n_levels=6, n_features=8,
                            log2_hashmap_size=11, base_resolution=64,
                            max_resolution=2048)
    spec3 = HashEncoderSpec(n_dims=3, n_levels=4, n_features=8,
                            log2_hashmap_size=11, base_resolution=16,
                            max_resolution=256)
    for tag, spec in (("dyn2d", spec2), ("flow3d", spec3)):
        table = init_hash_table(jax.random.PRNGKey(0), spec)
        x = jax.random.uniform(jax.random.PRNGKey(1), (n, spec.n_dims))
        t = jnp.float32(0.37)
        w = lagrange_weights(t, 4)
        ref = jax.jit(lambda tb: lagrange_time_interp(
            hash_encode(spec, tb, x), t, spec.n_levels, spec.n_features, 4
        ))(table)
        out = jax.jit(lambda tb: hash_encode_folded(spec, tb, x, w))(table)
        check(f"{tag} folded fwd vs gather+interpT", out, ref, 3e-2)

        cw = jnp.sin(jnp.arange(ref.size).reshape(ref.shape) * 0.37)
        g_f = jax.jit(jax.grad(
            lambda tb: jnp.sum(hash_encode_folded(spec, tb, x, w) * cw)
        ))(table)
        g_r = jax.jit(jax.grad(
            lambda tb: jnp.sum(lagrange_time_interp(
                hash_encode(spec, tb, x), t, spec.n_levels, spec.n_features, 4
            ) * cw)
        ))(table)
        check(f"{tag} folded table grad", g_f, g_r, 3e-2)

    # fused multi == per-variant folded
    k = jax.random.split(jax.random.PRNGKey(2), 4)
    tab0 = init_hash_table(k[0], spec2)
    tabs_ng = jnp.stack([init_hash_table(k[1], spec2),
                         init_hash_table(k[2], spec2)])
    xs = jax.random.uniform(k[3], (3, n, 2))
    ws = lagrange_weights(jnp.asarray([0.5, 0.52, 0.48]), 4)
    out = jax.jit(lambda t0: hash_encode_fact_multi_folded(
        spec2, t0, tabs_ng, xs, ws))(tab0)
    for v in range(3):
        tab = tab0 if v == 0 else tabs_ng[v - 1]
        want = jax.jit(lambda tb, vi=v: hash_encode_folded(
            spec2, tb, xs[vi], ws[vi]))(tab)
        # cross-compilation comparison: XLA constant-folds the closure-
        # captured neighbor tables in one jit but not the other, so the f32
        # fold can land on opposite sides of a bf16-cast rounding boundary —
        # bound at bf16 ulp, not exactness (variant 0, an argument in both
        # jits, measures 0.0)
        check(f"multi-folded variant {v}", out[v], want, 5e-3)

    # field-level folded vs unfolded fused path
    enc = HashGrid4D(base_resolution=64, max_resolution=2048,
                     log2_hashmap_size=11, n_levels=6,
                     n_features_per_level=8, hash_size_dynamic=(11, 10, 10))
    params = enc.init(jax.random.PRNGKey(3))
    xs3 = jax.random.uniform(jax.random.PRNGKey(4), (3, 65536, 3))
    ts = jnp.asarray([0.5, 0.52, 0.48], jnp.float32)
    got = jax.jit(lambda p: enc.forward_dynamic_multi(p, xs3, ts, fused=True))(params)
    want = jax.jit(lambda p: enc.forward_dynamic_multi(p, xs3, ts, fused=False))(params)
    check("field fused(folded) vs loop fwd", got, want, 3e-2)

    def loss(p, fused):
        return jnp.sum(enc.forward_dynamic_multi(p, xs3, ts, fused=fused) ** 2)

    g_f = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    g_l = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    for key in ("dynamic_0", "dynamic_1", "dynamic_2"):
        check(f"field fused grad {key}", g_f[key], g_l[key], 5e-2)

    # short flagship train loop: finiteness sentinel on chip
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
    losses = []
    t_warm = None
    for i in range(40):
        key, kk = jax.random.split(key)
        frame = jax.tree.map(jnp.asarray, ds.frame(i % len(ds)))
        state, m = step(state, frame, cache, kk)
        if i == 1:
            float(m["loss"])
            t_warm = time.perf_counter()
        if i in (0, 1, 10, 39):
            losses.append((i, float(m["loss"])))
    dt = time.perf_counter() - t_warm
    print("hier losses:", losses, flush=True)
    assert all(np.isfinite(v) for _, v in losses), "NaN loss"
    bad = [
        i for i, l in enumerate(jax.tree.leaves(state.params))
        if not np.isfinite(np.asarray(l)).all()
    ]
    mu = np.asarray(state.opt_state["adam"].mu)
    nu = np.asarray(state.opt_state["adam"].nu)
    print(f"params nonfinite leaves: {bad}; mu finite {np.isfinite(mu).all()}"
          f"; nu finite {np.isfinite(nu).all()}", flush=True)
    assert not bad and np.isfinite(mu).all() and np.isfinite(nu).all()
    print(f"38 steps (post-warm, incl dispatch): {dt:.1f}s "
          f"= {dt / 38 * 1000:.1f} ms/step "
          f"({38 * 1024 / dt:,.0f} rays/s)", flush=True)
    print("ALL CHECKS PASSED", flush=True)


if __name__ == "__main__":
    main()
