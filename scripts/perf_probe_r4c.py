"""Round-4 probe, part C — one-hot BUILD variants inside the real grouped
folded kernel shape (the dyn-plane sweep is 73% of density's corner-levels).

Per corner-level the factorized kernel's VPU cost is
  LO compares (lo one-hot) + HI*F_out compares (hi mask)  [elems x BN]
Current: LO=128 fixed -> 128 + 32 = 160 for the folded planes (F'=2).
Variants probed here, all functionally verified against the shipped kernel:
  A. int32 compares (shipped form) — baseline.
  B. bf16 compares (iota/lo/hi pre-cast) — wins iff Mosaic packs 16-bit
     compare/select 2-per-lane.
  C. LO=64 split (optimal LO = sqrt(R*F') = 64 at R=2048, F'=2):
     64 + 64 = 128 elems, and the lo one-hot tile halves.
  D. LO=64 + bf16.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r4c.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar4d_tpu.ops.hash_enc import HashEncoderSpec, init_hash_table, lagrange_weights
from lidar4d_tpu.ops import hash_onehot as ho


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


def make_grouped_fwd(lo_bits, cmp_bf16):
    """Probe twin of ho._fwd_kernel_fact_grouped with a variable lo split
    and optional bf16 compares."""
    lo_w = 1 << lo_bits

    def kernel(idx_ref, wgt_ref, tab_ref, out_ref, *, nc, n_levels, f_out):
        hfp = tab_ref.shape[1] // n_levels
        rp, bn = out_ref.shape
        hi_n = hfp // f_out
        if cmp_bf16:
            iota_lo = jax.lax.broadcasted_iota(
                jnp.int32, (lo_w, bn), 0).astype(jnp.bfloat16)
            iota_h = (jax.lax.broadcasted_iota(jnp.int32, (hfp, bn), 0)
                      // f_out).astype(jnp.bfloat16)
        else:
            iota_lo = jax.lax.broadcasted_iota(jnp.int32, (lo_w, bn), 0)
            iota_h = jax.lax.broadcasted_iota(jnp.int32, (hfp, bn), 0) // f_out

        accs = []
        for li in range(n_levels):
            tab = tab_ref[0, li * hfp:(li + 1) * hfp, :].astype(jnp.bfloat16)
            ohs, his = [], []
            for ci in range(nc):
                idx = idx_ref[0, li * nc + ci, :]
                wgt = wgt_ref[0, li * nc + ci, :]
                lo = idx & (lo_w - 1)
                hi = idx >> lo_bits
                if cmp_bf16:
                    lo = lo.astype(jnp.bfloat16)
                    hi = hi.astype(jnp.bfloat16)
                    wgt = wgt.astype(jnp.bfloat16)
                his.append(hi)
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

    return kernel


def pack_table_lo(spec_f, table_f, lo_bits):
    """Flat [rows, F'] -> [L, HI*F', LO] for a variable lo split."""
    lo_w = 1 << lo_bits
    r_max = max(spec_f.table_sizes)
    r_max = ((r_max + lo_w - 1) // lo_w) * lo_w
    hi_n = r_max // lo_w
    f = spec_f.n_features
    parts = []
    for level in range(spec_f.n_levels):
        off = spec_f.level_offsets[level]
        size = spec_f.table_sizes[level]
        part = table_f[off:off + size]
        if size < r_max:
            part = jnp.concatenate(
                [part, jnp.zeros((r_max - size, f), table_f.dtype)], axis=0)
        parts.append(
            part.reshape(hi_n, lo_w, f).transpose(0, 2, 1).reshape(
                hi_n * f, lo_w))
    return jnp.stack(parts)


def run_variant(name, spec, table, xs, ws, lo_bits, cmp_bf16, want=None):
    v, n = xs.shape[0], xs.shape[1]
    b = ws.shape[1]
    fp = spec.n_features // b
    spec_f = ho._folded_spec(spec, b)
    l = spec_f.n_levels
    lo_w = 1 << lo_bits
    r_max = ((max(spec_f.table_sizes) + lo_w - 1) // lo_w) * lo_w
    hfp = (r_max // lo_w) * fp
    rp = ((l * fp + 7) // 8) * 8
    bn = 512
    kern = make_grouped_fwd(lo_bits, cmp_bf16)

    def fwd(table, xs):
        packs, idxs, wgts = [], [], []
        for vi in range(v):
            tab_f = ho._fold_table(table, ws[vi], fp)
            packs.append(pack_table_lo(spec_f, tab_f, lo_bits).reshape(
                -1, lo_w))
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
            functools.partial(kern, nc=nc, n_levels=l, f_out=fp),
            grid=(v, nb),
            in_specs=[
                pl.BlockSpec((1, lnc, bn), lambda vi, bb: (vi, 0, bb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, lnc, bn), lambda vi, bb: (vi, 0, bb),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, l * hfp, lo_w), lambda vi, bb: (vi, 0, 0),
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
        m = float(jnp.abs(want).max())
        print(f"{name} max|diff| {d:.2e} (ref max {m:.2f})", flush=True)
    timeit(f"{name} fwd", f, table, xs)
    return got


def main():
    print("backend:", jax.default_backend(), flush=True)
    n = 196608
    # flagship dynamic-plane shape: 2D, 6 levels, F=8, R=2048, basis 4
    spec = HashEncoderSpec(n_dims=2, n_levels=6, n_features=8,
                           log2_hashmap_size=11, base_resolution=64,
                           max_resolution=2048)
    table = init_hash_table(jax.random.PRNGKey(0), spec)
    xs = jax.random.uniform(jax.random.PRNGKey(1), (3, n, 2))
    ts = jnp.asarray([0.5, 0.52, 0.48], jnp.float32)
    ws = jnp.stack([lagrange_weights(t, 4) for t in ts])

    # shipped kernel as the reference output + baseline time
    tng = jnp.stack([table, table])

    def shipped(table, xs):
        return ho.hash_encode_fact_multi_folded(spec, table, tng, xs, ws)

    fs = jax.jit(shipped)
    want = fs(table, xs)
    timeit("shipped grouped folded fwd (LO=128, i32)", fs, table, xs)

    # NB round-4 probe result: Mosaic PACKS pre-cast bf16 compares into
    # 8x128x2 vregs but v5e rejects packed bf16 cmpf ("Target does not
    # support this comparison") — the bf16-compare variants are dead on this
    # generation; only the lo-split variants below are viable.
    run_variant("A mirror LO=128 i32", spec, table, xs, ws, 7, False,
                want=want)
    run_variant("C LO=64 i32", spec, table, xs, ws, 6, False, want=want)
    run_variant("E LO=32 i32", spec, table, xs, ws, 5, False, want=want)

    # static-hash shape (3D, F=8, no folding): LO sweep at F_out=8
    spec3 = HashEncoderSpec(n_dims=3, n_levels=6, n_features=8,
                            log2_hashmap_size=11, base_resolution=64,
                            max_resolution=2048)
    tab3 = init_hash_table(jax.random.PRNGKey(2), spec3)
    x3 = jax.random.uniform(jax.random.PRNGKey(3), (n, 3))

    def shipped3(tab, x):
        return ho.hash_encode_onehot_fact(spec3, tab, x)

    f3 = jax.jit(shipped3)
    want3 = f3(tab3, x3)
    timeit("shipped static fact fwd (LO=128, i32)", f3, tab3, x3)

    # reuse the grouped runner with B=1 folding (identity weights)
    ws1 = jnp.ones((1, 1), jnp.float32)
    x31 = x3[None]
    want31 = want3[None]
    run_variant("S LO=128 i32 static", spec3, tab3, x31, ws1, 7, False,
                want=want31)
    run_variant("S LO=64 i32 static (expect worse)", spec3, tab3, x31, ws1,
                6, False, want=want31)

    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
