"""Round-4 probe, part B — the sections the part-A run never reached
(it compile-OOM'd at eval chunk=32768 first).

1. Mosaic in-kernel take_along_axis row gather ([sublanes, lanes] vreg
   table, lane indices) — the candidate replacement for the one-hot
   build+matmul in the factorized hash kernel.
2. Merge one-hot vs argsort at eval chunk size (16384 rays x 384).
3. Lo-one-hot build cost in isolation: f32 compare sweep vs int8 compare
   sweep vs broadcasted-iota equality — to size VERDICT r3 #3(c).

All timings sync via float() (block_until_ready lies on axon).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r4b.py
"""

import time

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name}: {dt:.1f} ms", flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)

    # ---- 1. Mosaic in-kernel take_along_axis feasibility
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def gk(tab_ref, lo_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], lo_ref[:], axis=1)

    bn = 512
    nb = 96
    for rows, width in ((8, 128), (32, 128), (8, 256), (8, 512), (8, 2048)):
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

    # ---- 2. merge at eval chunk size: one-hot vs argsort
    from lidar4d_tpu.models import renderer as rmod

    za = jnp.sort(jax.random.uniform(jax.random.PRNGKey(6), (16384, 128)), -1)
    zb = jnp.sort(jax.random.uniform(jax.random.PRNGKey(7), (16384, 256)), -1)
    sig = jax.random.normal(jax.random.PRNGKey(8), (16384, 384))
    geo = jax.random.normal(jax.random.PRNGKey(9), (16384, 384, 15))

    def do_merge(za, zb, sig, geo):
        z, (s, g) = rmod.merge_sorted(za, zb, [sig, geo])
        return z

    old_max = rmod._MERGE_ONEHOT_MAX_ELEMS
    timeit("merge 16384x384 argsort path", jax.jit(do_merge), za, zb, sig,
           geo)
    rmod._MERGE_ONEHOT_MAX_ELEMS = 16384 * 384 * 384 + 1
    try:
        timeit("merge 16384x384 one-hot path", jax.jit(do_merge), za, zb,
               sig, geo)
    except Exception as e:  # noqa: BLE001
        print(f"merge one-hot at 16384 failed: {e}", flush=True)
    finally:
        rmod._MERGE_ONEHOT_MAX_ELEMS = old_max

    # ---- 3. lo-one-hot build cost in isolation (196k pts x 8 corners)
    n = 196608 * 8  # all corners of a 3D level at 196k points
    lo = jax.random.randint(jax.random.PRNGKey(12), (n,), 0, 128)

    def build_f32(lo):
        return (lo[:, None] == jnp.arange(128)[None, :]).astype(jnp.float32)

    def build_bf16(lo):
        return (lo[:, None] == jnp.arange(128)[None, :]).astype(jnp.bfloat16)

    def build_i8(lo):
        return (lo[:, None] == jnp.arange(128)[None, :]).astype(jnp.int8)

    timeit("XLA lo-onehot f32 [1.6M,128] build+sum",
           jax.jit(lambda l: build_f32(l).sum()), lo)
    timeit("XLA lo-onehot bf16 [1.6M,128] build+sum",
           jax.jit(lambda l: build_bf16(l).sum()), lo)
    timeit("XLA lo-onehot i8 [1.6M,128] build+sum",
           jax.jit(lambda l: build_i8(l).sum()), lo)

    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
