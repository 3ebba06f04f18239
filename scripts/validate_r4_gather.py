"""On-chip validation of the r4 gather-form folded forward + grouped folded
backward (template: scripts/validate_r3_fix.py — CPU tests cannot catch
TPU-only lowering/precision behavior, CLAUDE.md invariant).

1. hash_encode_folded / hash_encode_fact_multi_folded FORWARD vs the exact
   f32 gather path (encode -> lagrange_time_interp) — the gather-form kernel
   does exact f32 lookups, so agreement should be ~1e-6 relative (the old
   one-hot form was bf16-class 1e-2).
2. Folded table gradients vs autodiff through the gather path — bf16-matmul
   tolerance (the bwd still rides the one-hot MXU contraction).
3. 40 hierarchical train steps on the bench-shape config: finite, decreasing
   losses; step timing vs the r4d baseline 116.1 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/validate_r4_gather.py
"""

import time

import jax
import jax.numpy as jnp

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


def rel(a, b):
    d = float(jnp.abs(a - b).max())
    m = float(jnp.abs(b).max())
    return d, d / max(m, 1e-30)


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 196608
    ok = True

    # --- dyn-plane shape (2D, folded B=4)
    spec = HashEncoderSpec(n_dims=2, n_levels=6, n_features=8,
                           log2_hashmap_size=11, base_resolution=64,
                           max_resolution=2048)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 2))
    t = jnp.float32(0.37)
    w = lagrange_weights(t, 4)

    got = jax.jit(lambda tb: hash_encode_folded(spec, tb, x, w))(table)
    want = jax.jit(lambda tb: lagrange_time_interp(
        hash_encode(spec, tb, x), t, 6, 8, 4))(table)
    d, r = rel(got, want)
    print(f"dyn2d folded fwd vs gather: max|d| {d:.2e} rel {r:.2e}",
          flush=True)
    ok &= r < 1e-5

    cw = jax.random.normal(jax.random.PRNGKey(2), got.shape)
    g_new = jax.jit(jax.grad(lambda tb: jnp.sum(
        hash_encode_folded(spec, tb, x, w) * cw)))(table)
    g_ref = jax.jit(jax.grad(lambda tb: jnp.sum(lagrange_time_interp(
        hash_encode(spec, tb, x), t, 6, 8, 4) * cw)))(table)
    d, r = rel(g_new, g_ref)
    print(f"dyn2d folded table-grad vs gather autodiff: max|d| {d:.2e} "
          f"rel {r:.2e}", flush=True)
    ok &= r < 2e-2

    # --- fused 3-variant
    tng = jnp.stack([table * 0.9, table * 1.1])
    xs = jax.random.uniform(jax.random.PRNGKey(3), (3, n, 2))
    ts = jnp.asarray([0.5, 0.52, 0.48], jnp.float32)
    ws = lagrange_weights(ts, 4)
    gotm = jax.jit(lambda tb: hash_encode_fact_multi_folded(
        spec, tb, tng, xs, ws))(table)
    for vi in range(3):
        tab = table if vi == 0 else tng[vi - 1]
        wantv = jax.jit(lambda tb, v=vi: lagrange_time_interp(
            hash_encode(spec, tb, xs[v]), ts[v], 6, 8, 4))(tab)
        d, r = rel(gotm[vi], wantv)
        print(f"multi v{vi} fwd: max|d| {d:.2e} rel {r:.2e}", flush=True)
        ok &= r < 1e-5
    gm = jax.jit(jax.grad(lambda tb: jnp.sum(hash_encode_fact_multi_folded(
        spec, tb, tng, xs, ws)[0] ** 2)))(table)
    gr = jax.jit(jax.grad(lambda tb: jnp.sum(lagrange_time_interp(
        hash_encode(spec, tb, xs[0]), ts[0], 6, 8, 4) ** 2)))(table)
    d, r = rel(gm, gr)
    print(f"multi v0 table-grad: max|d| {d:.2e} rel {r:.2e}", flush=True)
    ok &= r < 2e-2

    # --- flow shape (3D, folded)
    spec3 = HashEncoderSpec(n_dims=3, n_levels=4, n_features=8,
                            log2_hashmap_size=11, base_resolution=16,
                            max_resolution=256)
    tab3 = init_hash_table(jax.random.PRNGKey(4), spec3)
    x3 = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))
    got3 = jax.jit(lambda tb: hash_encode_folded(spec3, tb, x3, w))(tab3)
    want3 = jax.jit(lambda tb: lagrange_time_interp(
        hash_encode(spec3, tb, x3), t, 4, 8, 4))(tab3)
    d, r = rel(got3, want3)
    print(f"flow3d folded fwd: max|d| {d:.2e} rel {r:.2e}", flush=True)
    ok &= r < 1e-5
    g3 = jax.jit(jax.grad(lambda tb: jnp.sum(
        hash_encode_folded(spec3, tb, x3, w) ** 2)))(tab3)
    g3r = jax.jit(jax.grad(lambda tb: jnp.sum(lagrange_time_interp(
        hash_encode(spec3, tb, x3), t, 4, 8, 4) ** 2)))(tab3)
    d, r = rel(g3, g3r)
    print(f"flow3d folded table-grad: max|d| {d:.2e} rel {r:.2e}", flush=True)
    ok &= r < 2e-2

    print(f"KERNEL CHECKS {'PASS' if ok else 'FAIL'}", flush=True)

    # --- 40 full train steps: finite + decreasing + timing
    import bench
    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
    from lidar4d_tpu.train.losses import LossConfig
    from lidar4d_tpu.train.train_step import init_train_state, make_train_step

    ds, refine_ds, scale = bench.get_dataset()
    cache = jax.tree.map(jnp.asarray, bench.get_flow_cache(refine_ds, scale))
    frames = [jax.tree.map(jnp.asarray, ds.frame(i)) for i in range(len(ds))]
    loss_cfg = LossConfig(flow_loss=True, grad_loss=True, scale=scale,
                          num_frames=bench.FRAMES, iters=30000)
    cfg = LiDAR4DConfig(
        num_frames=bench.FRAMES, near_lidar=1.0 * scale,
        far_lidar=81.0 * scale,
        n_levels_hash=6, n_features_per_level_hash=8,
        log2_hashmap_size=11, base_resolution=64, max_resolution=2048,
        hash_size_dynamic=(11, 10, 10),
        flow_n_levels=4, flow_n_features=8, flow_log2_hashmap_size=11,
        flow_base_resolution=16, flow_max_resolution=256,
        remat_density=False, density_chunk=0,
    )
    field = LiDAR4DField(cfg)
    state, opt = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2,
                                  iters=30000)
    step = make_train_step(
        field, opt, loss_cfg, H=bench.H, W=bench.W, fov_lidar=(2.0, 26.9),
        num_rays=1024, num_steps=768, patch_size=1,
        num_coarse=128, num_fine=256,
    )
    key = jax.random.PRNGKey(1)
    losses = []
    t0 = None
    for i in range(40):
        key, k = jax.random.split(key)
        state, metrics = step(state, frames[i % len(frames)], cache, k)
        if i == 4:
            float(metrics["loss"])
            t0 = time.perf_counter()
        if i % 10 == 9:
            losses.append(float(metrics["loss"]))
    dt = (time.perf_counter() - t0) / 35 * 1000
    import numpy as np

    pf = bool(np.all(np.isfinite(
        np.concatenate([np.ravel(l) for l in jax.tree.leaves(state.params)])
    )))
    print(f"losses @10/20/30/40: {losses}", flush=True)
    print(f"params finite: {pf}", flush=True)
    print(f"step: {dt:.1f} ms ({1024 * 1000 / dt:.0f} rays/s) "
          f"[r4d pre-change base: 116.1]", flush=True)
    print("VALIDATION DONE", flush=True)


if __name__ == "__main__":
    main()
