"""Round-4 on-chip perf probes.

1. Folded vs unfolded encode sweeps (dyn planes x3 variants, flow grid) —
   fwd and fwd+bwd at 196k points.
2. Full density fwd / fwd+bwd at 196k (flagship config).
3. Eval-frame render attribution: render_staged at chunk 16384 vs 32768;
   merge one-hot vs argsort at eval chunk sizes.
4. Feasibility: Mosaic in-kernel take_along_axis row gather ([8,128] vreg,
   lane indices) — the candidate replacement for the one-hot build+matmul.

All timings sync via float() (block_until_ready lies on axon).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r4.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0]))  # warm + sync
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name}: {dt:.1f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    from lidar4d_tpu.models.hash_field import HashGrid4D
    from lidar4d_tpu.ops.hash_enc import (
        HashEncoderSpec,
        init_hash_table,
        lagrange_time_interp,
        lagrange_weights,
    )
    from lidar4d_tpu.ops.hash_onehot import (
        hash_encode_fact_multi,
        hash_encode_fact_multi_folded,
        hash_encode_folded,
        hash_encode_onehot_fact,
    )

    n = 196608
    enc = HashGrid4D(base_resolution=64, max_resolution=2048,
                     log2_hashmap_size=11, n_levels=6,
                     n_features_per_level=8, hash_size_dynamic=(11, 10, 10))
    params = enc.init(jax.random.PRNGKey(3))
    xs3 = jax.random.uniform(jax.random.PRNGKey(4), (3, n, 3))
    ts = jnp.asarray([0.5, 0.52, 0.48], jnp.float32)

    # ---- 1. fused dynamic encode: folded vs unfolded
    f_fold = jax.jit(lambda p: enc.forward_dynamic_multi(p, xs3, ts, fused=True))
    timeit("dyn multi(3) folded fwd", f_fold, params)

    def unfolded(p):
        # pre-fold formulation: fused F=8 sweep + per-variant lagrange
        out = []
        t_idx = jnp.clip(ts, 0.0, 1.0) * (enc.time_resolution - 1)
        i1 = jnp.clip(jnp.floor(t_idx).astype(jnp.int32), 0,
                      enc.time_resolution - 1)
        i2 = jnp.clip(i1 + 1, 0, enc.time_resolution - 1)
        w2 = (t_idx - i1.astype(jnp.float32))[:, None, None]
        x = jnp.clip(xs3, 0.0, 1.0)
        sels = ((0, 1), (0, 2), (1, 2))
        for pi, sel in enumerate(sels):
            spec = enc.dynamic_spec(pi)
            stack = p[f"dynamic_{pi}"].reshape(
                enc.time_resolution, spec.n_rows, spec.n_features)
            tabs = (1.0 - w2) * jnp.take(stack, i1, axis=0) \
                + w2 * jnp.take(stack, i2, axis=0)
            g = hash_encode_fact_multi(spec, tabs[0], tabs[1:], x[:, :, sel])
            out.append(jnp.stack([
                lagrange_time_interp(g[vi], ts[vi], enc.n_levels,
                                     enc.n_features_per_level, 4)
                for vi in range(3)
            ]))
        return jnp.concatenate(out, -1)

    f_unf = jax.jit(unfolded)
    timeit("dyn multi(3) unfolded fwd", f_unf, params)

    g_fold = jax.jit(jax.grad(lambda p: jnp.sum(
        enc.forward_dynamic_multi(p, xs3, ts, fused=True) ** 2)))
    timeit("dyn multi(3) folded fwd+bwd", g_fold, params)
    g_unf = jax.jit(jax.grad(lambda p: jnp.sum(unfolded(p) ** 2)))
    timeit("dyn multi(3) unfolded fwd+bwd", g_unf, params)

    # ---- flow grid encode: folded vs unfolded
    spec3 = HashEncoderSpec(n_dims=3, n_levels=4, n_features=8,
                            log2_hashmap_size=11, base_resolution=16,
                            max_resolution=256)
    table3 = init_hash_table(jax.random.PRNGKey(0), spec3)
    x3 = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    t = jnp.float32(0.37)
    w = lagrange_weights(t, 4)
    timeit("flow3d folded fwd",
           jax.jit(lambda tb: hash_encode_folded(spec3, tb, x3, w)), table3)
    timeit("flow3d unfolded fwd",
           jax.jit(lambda tb: lagrange_time_interp(
               hash_encode_onehot_fact(spec3, tb, x3), t, 4, 8, 4)), table3)
    timeit("flow3d folded fwd+bwd",
           jax.jit(jax.grad(lambda tb: jnp.sum(
               hash_encode_folded(spec3, tb, x3, w) ** 2))), table3)
    timeit("flow3d unfolded fwd+bwd",
           jax.jit(jax.grad(lambda tb: jnp.sum(lagrange_time_interp(
               hash_encode_onehot_fact(spec3, tb, x3), t, 4, 8, 4) ** 2))),
           table3)

    # ---- 2. full density
    import bench
    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField

    ds, refine_ds, scale = bench.get_dataset()
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
    fparams = field.init(jax.random.PRNGKey(0))
    xd = jax.random.uniform(jax.random.PRNGKey(5), (n, 3), minval=-0.5,
                            maxval=0.5)
    tt = jnp.float32(0.5)
    timeit("full density fwd",
           jax.jit(lambda p: field.density(p, xd, tt)["sigma"]), fparams)
    timeit("full density fwd+bwd",
           jax.jit(jax.grad(lambda p: jnp.sum(
               field.density(p, xd, tt)["sigma"]))), fparams)

    # ---- 3. eval-frame render attribution
    from lidar4d_tpu.models.renderer import render_staged
    from lidar4d_tpu.ops.rays import get_lidar_rays

    frame = ds.frame(0)
    rays = get_lidar_rays(jnp.asarray(frame["pose"]),
                          (2.0, 26.9), 66, 1030, N=-1)
    ro, rd = rays["rays_o"], rays["rays_d"]
    tf = jnp.float32(frame["time"])
    for chunk in (16384, 32768):
        dt = timeit(
            f"eval frame render_staged chunk={chunk} (128+256)",
            lambda c=chunk: render_staged(
                field, fparams, ro, rd, tf, num_steps=768, chunk=c,
                num_coarse=128, num_fine=256,
            )["depth_lidar"],
            reps=2,
        )

    # merge at eval chunk size: one-hot vs argsort
    from lidar4d_tpu.models import renderer as rmod

    za = jnp.sort(jax.random.uniform(jax.random.PRNGKey(6), (16384, 128)), -1)
    zb = jnp.sort(jax.random.uniform(jax.random.PRNGKey(7), (16384, 256)), -1)
    sig = jax.random.normal(jax.random.PRNGKey(8), (16384, 384))
    geo = jax.random.normal(jax.random.PRNGKey(9), (16384, 384, 15))

    def do_merge(za, zb, sig, geo):
        z, (s, g) = rmod.merge_sorted(za, zb, [sig, geo])
        return z

    old_max = rmod._MERGE_ONEHOT_MAX_ELEMS
    timeit("merge 16384x384 argsort path", jax.jit(do_merge), za, zb, sig, geo)
    rmod._MERGE_ONEHOT_MAX_ELEMS = 16384 * 384 * 384 + 1
    try:
        timeit("merge 16384x384 one-hot path", jax.jit(do_merge), za, zb, sig,
               geo)
    except Exception as e:  # noqa: BLE001
        print(f"merge one-hot at 16384 failed: {e}", flush=True)
    finally:
        rmod._MERGE_ONEHOT_MAX_ELEMS = old_max

    # ---- 4. Mosaic in-kernel take_along_axis feasibility
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def gk(tab_ref, lo_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], lo_ref[:], axis=1)

    bn = 512
    nb = 96
    for rows, width in ((8, 128), (32, 128), (8, 256), (8, 512)):
        tab = jax.random.normal(jax.random.PRNGKey(10), (rows, width))
        lo = jax.random.randint(jax.random.PRNGKey(11), (rows, nb * bn), 0,
                                width)
        try:
            f = pl.pallas_call(
                gk,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((rows, width), lambda b: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((rows, bn), lambda b: (0, b),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rows, bn), lambda b: (0, b),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, nb * bn), jnp.float32),
            )
            out = f(tab, lo)
            want = jnp.take_along_axis(
                jnp.broadcast_to(tab[:, None, :], (rows, nb * bn, width)),
                lo[:, :, None], axis=2)[..., 0]
            d = float(jnp.abs(out - want).max())
            ok = "OK" if d == 0.0 else f"WRONG (diff {d:.1e})"
            print(f"in-kernel take_along_axis [{rows},{width}]: {ok}",
                  flush=True)
            jf = jax.jit(lambda t, l, ff=f: ff(t, l))
            timeit(f"in-kernel gather [{rows},{width}] x 49k idx", jf, tab,
                   lo, reps=10)
        except Exception as e:  # noqa: BLE001
            print(f"in-kernel take_along_axis [{rows},{width}]: UNSUPPORTED "
                  f"({type(e).__name__}: {str(e)[:200]})", flush=True)

    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
