"""Round-4 probe, part E — is the grouped folded dyn kernel MATMUL-bound?

Its per-(level, corner-batch) matmul is [HF'=32, 128] x [128, nc*BN=2048]:
M=32 uses a quarter of the MXU's rows, and a 1024-ray step issues ~27k such
matmuls. The LO-split probe (r4c) got WORSE with smaller K — consistent
with matmul fill/drain overhead, not VPU build cost, dominating. Variants:

  * BN=1024 / BN=2048 — halve/quarter the matmul count (the 512 default is
    a worst-case bound for nc=8/hf=256 shapes; the dyn-folded shape has
    plenty of VMEM headroom).
  * block-diagonal level batching — stack the 6 levels' one-hot tiles
    vertically and the 6 tables into one [L*HF', L*128] block-diagonal lhs:
    ONE [192, 768] x [768, nc*BN] matmul per block instead of 6 M=32 ones
    (6x the MACs, 5/6 zeros — the MXU has idle rows either way).

All verified against the shipped kernel's output.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r4e.py
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


def grouped_kernel(idx_ref, wgt_ref, tab_ref, out_ref, *, nc, n_levels,
                   f_out, blockdiag):
    rp, bn = out_ref.shape
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LANE, bn), 0)

    if blockdiag:
        lhf = tab_ref.shape[1]          # L * HF'
        hfp = lhf // n_levels
        hi_n = hfp // f_out
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (hfp, bn), 0) // f_out
        tab = tab_ref[0].astype(jnp.bfloat16)     # [L*HF', L*128]
        ohs, his = [], []
        for li in range(n_levels):
            for ci in range(nc):
                idx = idx_ref[0, li * nc + ci, :]
                wgt = wgt_ref[0, li * nc + ci, :]
                lo = idx & (_LANE - 1)
                his.append(idx >> 7)
                ohs.append(jnp.where(
                    iota_lo == lo[None, :], wgt[None, :], 0.0
                ).astype(jnp.bfloat16))
        # rhs rows = (level, lo); per level its nc corner tiles sit in the
        # SAME row block, concatenated along columns
        rhs = jnp.concatenate([
            jnp.concatenate(ohs[li * nc:(li + 1) * nc], axis=1)
            for li in range(n_levels)
        ], axis=0)                                   # [L*128, nc*BN]
        step_all = jax.lax.dot_general(
            tab, rhs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                            # [L*HF', nc*BN]
        accs = []
        for li in range(n_levels):
            acc = jnp.zeros((f_out, bn), jnp.float32)
            for ci in range(nc):
                s = step_all[li * hfp:(li + 1) * hfp,
                             ci * bn:(ci + 1) * bn]
                masked = jnp.where(iota_h == his[li * nc + ci][None, :], s,
                                   0.0)
                acc = acc + masked.reshape(hi_n, f_out, bn).sum(axis=0)
            accs.append(acc)
    else:
        lhf = tab_ref.shape[1]
        hfp = lhf // n_levels
        hi_n = hfp // f_out
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (hfp, bn), 0) // f_out
        accs = []
        for li in range(n_levels):
            tab = tab_ref[0, li * hfp:(li + 1) * hfp, :].astype(jnp.bfloat16)
            ohs, his = [], []
            for ci in range(nc):
                idx = idx_ref[0, li * nc + ci, :]
                wgt = wgt_ref[0, li * nc + ci, :]
                lo = idx & (_LANE - 1)
                his.append(idx >> 7)
                ohs.append(jnp.where(
                    iota_lo == lo[None, :], wgt[None, :], 0.0
                ).astype(jnp.bfloat16))
            step1 = jax.lax.dot_general(
                tab, jnp.concatenate(ohs, axis=1), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = jnp.zeros((f_out, bn), jnp.float32)
            for ci in range(nc):
                s = step1[:, ci * bn:(ci + 1) * bn]
                masked = jnp.where(iota_h == his[ci][None, :], s, 0.0)
                acc = acc + masked.reshape(hi_n, f_out, bn).sum(axis=0)
            accs.append(acc)
    if rp > n_levels * f_out:
        accs.append(jnp.zeros((rp - n_levels * f_out, bn), jnp.float32))
    out_ref[:] = jnp.concatenate(accs, axis=0)


def run_variant(name, spec, table, xs, ws, bn, blockdiag, want=None):
    v, n = xs.shape[0], xs.shape[1]
    b = ws.shape[1]
    fp = spec.n_features // b
    spec_f = ho._folded_spec(spec, b)
    l = spec_f.n_levels
    r_max = ho._r_max(spec_f)
    hfp = (r_max // _LANE) * fp

    def fwd(table, xs):
        packs, idxs, wgts = [], [], []
        for vi in range(v):
            tab_f = ho._fold_table(table, ws[vi], fp)
            p = ho._pack_table_fact(spec_f, tab_f)     # [L, HF', 128]
            if blockdiag:
                # [L*HF', L*128] block-diagonal
                blocks = []
                for li in range(l):
                    row = [jnp.zeros((hfp, _LANE), p.dtype)] * l
                    row[li] = p[li]
                    blocks.append(jnp.concatenate(row, axis=1))
                packs.append(jnp.concatenate(blocks, axis=0))
            else:
                packs.append(p.reshape(l * hfp, _LANE))
            i, wg = ho._prep(spec_f, xs[vi])
            idxs.append(i.reshape(-1, n))
            wgts.append(wg.reshape(-1, n))
        idx = jnp.stack(idxs)
        wgt = jnp.stack(wgts)
        packed = jnp.stack(packs)
        lnc = idx.shape[1]
        nc = lnc // l
        rp = ((l * fp + 7) // 8) * 8
        pad = (-n) % bn
        if pad:
            idx = jnp.concatenate(
                [idx, jnp.zeros((v, lnc, pad), idx.dtype)], -1)
            wgt = jnp.concatenate(
                [wgt, jnp.zeros((v, lnc, pad), wgt.dtype)], -1)
        nb = idx.shape[2] // bn
        tr, tc = packed.shape[1], packed.shape[2]
        out = pl.pallas_call(
            functools.partial(grouped_kernel, nc=nc, n_levels=l, f_out=fp,
                              blockdiag=blockdiag),
            grid=(v, nb),
            in_specs=[
                pl.BlockSpec((1, lnc, bn), lambda vi, bb: (vi, 0, bb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lnc, bn), lambda vi, bb: (vi, 0, bb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tr, tc), lambda vi, bb: (vi, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rp, bn), lambda vi, bb: (vi, bb),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((v * rp, nb * bn), jnp.float32),
        )(idx, wgt, packed)
        out = out.reshape(v, rp, nb * bn)[:, : l * fp, :n]
        return out.transpose(0, 2, 1)

    f = jax.jit(fwd)
    got = f(table, xs)
    if want is not None:
        d = float(jnp.abs(got - want).max())
        print(f"{name} max|diff| {d:.2e}", flush=True)
    timeit(f"{name} fwd", f, table, xs)


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 196608
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
    timeit("shipped (BN=512)", fs, table, xs)

    run_variant("mirror BN=512", spec, table, xs, ws, 512, False, want=want)
    run_variant("BN=1024", spec, table, xs, ws, 1024, False, want=want)
    run_variant("BN=2048", spec, table, xs, ws, 2048, False, want=want)
    run_variant("blockdiag BN=512", spec, table, xs, ws, 512, True,
                want=want)
    run_variant("blockdiag BN=1024", spec, table, xs, ws, 1024, True,
                want=want)
    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
