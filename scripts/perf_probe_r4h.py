"""Round-4 probe, part H — GATHER-form grouped folded hash forward.

r4g confirmed Mosaic lowers take_along_axis on exactly one vreg
([8, 128] table, [8, 128] lane indices). That turns the factorized
corner lookup into a register gather:

  per corner-level, per 128-point lane chunk, per 8-sublane row group g:
    got  = take_along_axis(T[g*8:(g+1)*8, :], lo_b, axis=1)   # [8, 128]
    acc += where(hi_b == srow//F' + g*(8//F'), got * wgt_b, 0)

  then one strided sublane reduce per level collapses the h rows.

~16 vreg-ops per corner-level per chunk vs the one-hot build's ~44
(plus NO MXU matmul, and the lookup is EXACT f32 — closer to the gather
reference than the bf16 one-hot contraction). Variants: BN=128 (chunk =
block) and BN=512 with an in-kernel chunk loop. Measured at 786k points
to beat the ~25 ms/sync tunnel constant.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r4h.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar4d_tpu.ops.hash_enc import HashEncoderSpec, init_hash_table, lagrange_weights
from lidar4d_tpu.ops import hash_onehot as ho

_LANE = 128


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _i in range(reps):
        out = fn(*args)
        _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def gather_kernel(idx_ref, wgt_ref, tab_ref, out_ref, *, nc, n_levels,
                  f_out, bn):
    """Blocks: idx/wgt [1, L*nc, BN]; tab [1, L*HF', 128] (fact layout);
    out [RP, BN]."""
    hfp = tab_ref.shape[1] // n_levels
    rp = out_ref.shape[0]
    n_groups = hfp // 8
    hper = 8 // f_out                     # h rows per sublane group
    srow = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 0) // f_out

    accs = []
    for li in range(n_levels):
        chunk_accs = []
        for s in range(bn // _LANE):
            sl = slice(s * _LANE, (s + 1) * _LANE)
            acc = jnp.zeros((8, _LANE), jnp.float32)
            for ci in range(nc):
                idx = idx_ref[0, li * nc + ci, sl]
                wgt = wgt_ref[0, li * nc + ci, sl]
                lo = idx & (_LANE - 1)
                hi = idx >> 7
                lo_b = jnp.broadcast_to(lo[None, :], (8, _LANE))
                hi_b = jnp.broadcast_to(hi[None, :], (8, _LANE))
                wgt_b = wgt[None, :]
                for g in range(n_groups):
                    tg = tab_ref[0, li * hfp + g * 8: li * hfp + (g + 1) * 8, :]
                    got = jnp.take_along_axis(tg, lo_b, axis=1)
                    acc = acc + jnp.where(
                        hi_b == srow + g * hper, got * wgt_b, 0.0)
            chunk_accs.append(acc)
        acc8 = jnp.concatenate(chunk_accs, axis=1)      # [8, BN]
        # strided sublane reduce: out[f', n] = sum_k acc8[k*f_out + f', n]
        rows = []
        for f in range(f_out):
            r = acc8[f: f + 1, :]
            for k in range(1, hper):
                r = r + acc8[k * f_out + f: k * f_out + f + 1, :]
            rows.append(r)
        accs.append(jnp.concatenate(rows, axis=0))      # [f_out, BN]
    if rp > n_levels * f_out:
        accs.append(jnp.zeros((rp - n_levels * f_out, acc8.shape[1]),
                              jnp.float32))
    out_ref[:] = jnp.concatenate(accs, axis=0)


def run_gather(name, spec, table, xs, ws, bn, want=None):
    v, n = xs.shape[0], xs.shape[1]
    b = ws.shape[1]
    fp = spec.n_features // b
    spec_f = ho._folded_spec(spec, b)
    l = spec_f.n_levels
    hfp = (ho._r_max(spec_f) // _LANE) * fp
    rp = ((l * fp + 7) // 8) * 8

    def fwd(table, xs):
        packs, idxs, wgts = [], [], []
        for vi in range(v):
            tab_f = ho._fold_table(table, ws[vi], fp)
            packs.append(
                ho._pack_table_fact(spec_f, tab_f).reshape(l * hfp, _LANE))
            i, wg = ho._prep(spec_f, xs[vi])
            idxs.append(i.reshape(-1, n))
            wgts.append(wg.reshape(-1, n))
        idx = jnp.stack(idxs)
        wgt = jnp.stack(wgts)
        packed = jnp.stack(packs)
        lnc = idx.shape[1]
        nc = lnc // l
        pad = (-n) % bn
        if pad:
            idx = jnp.concatenate(
                [idx, jnp.zeros((v, lnc, pad), idx.dtype)], -1)
            wgt = jnp.concatenate(
                [wgt, jnp.zeros((v, lnc, pad), wgt.dtype)], -1)
        nb = idx.shape[2] // bn
        out = pl.pallas_call(
            functools.partial(gather_kernel, nc=nc, n_levels=l, f_out=fp,
                              bn=bn),
            grid=(v, nb),
            in_specs=[
                pl.BlockSpec((1, lnc, bn), lambda vi, bb: (vi, 0, bb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lnc, bn), lambda vi, bb: (vi, 0, bb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, l * hfp, _LANE), lambda vi, bb: (vi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rp, bn), lambda vi, bb: (vi, bb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((v * rp, nb * bn), jnp.float32),
        )(idx, wgt, packed)
        out = out.reshape(v, rp, nb * bn)[:, : l * fp, :n]
        return out.transpose(0, 2, 1)

    f = jax.jit(fwd)
    try:
        got = f(table, xs)
        if want is not None:
            d = float(jnp.abs(got - want).max())
            m = float(jnp.abs(want).max())
            print(f"{name} max|diff| {d:.2e} (want max {m:.2e})", flush=True)
        timeit(f"{name} fwd", f, table, xs)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:300]})",
              flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 786432
    spec = HashEncoderSpec(n_dims=2, n_levels=6, n_features=8,
                           log2_hashmap_size=11, base_resolution=64,
                           max_resolution=2048)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    xs = jax.random.uniform(jax.random.PRNGKey(1), (3, n, 2))
    ts = jnp.asarray([0.5, 0.52, 0.48], jnp.float32)
    ws = jnp.stack([lagrange_weights(t, 4) for t in ts])
    tng = jnp.stack([table, table])

    def shipped(table, xs):
        return ho.hash_encode_fact_multi_folded(spec, table, tng, xs, ws)

    fs = jax.jit(shipped)
    want = fs(table, xs)
    timeit("shipped one-hot fwd @786k", fs, table, xs)

    run_gather("gather BN=128", spec, table, xs, ws, 128, want=want)
    run_gather("gather BN=512", spec, table, xs, ws, 512, want=want)

    # 3D static-shape folded? static has no fold; probe the flow spec (3D,
    # 4 levels, F'=2 after fold) at the same point count
    spec3 = HashEncoderSpec(n_dims=3, n_levels=4, n_features=8,
                            log2_hashmap_size=11, base_resolution=16,
                            max_resolution=256)
    tab3 = init_hash_table(jax.random.PRNGKey(2), spec3)
    x3 = jax.random.uniform(jax.random.PRNGKey(3), (1, n, 3))
    ws1 = lagrange_weights(jnp.asarray([0.37], jnp.float32), 4)

    def shipped3(tab, x):
        return ho.hash_encode_folded(spec3, tab, x[0], ws1[0])

    f3 = jax.jit(shipped3)
    want3 = f3(tab3, x3)[None]
    timeit("shipped flow3d folded fwd @786k", f3, tab3, x3)
    run_gather("gather flow3d BN=512", spec3, tab3, x3, ws1, 512,
               want=want3)

    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
