"""Round-4 probe, part F — narrow-int compares in the one-hot build.

r4c showed Mosaic PACKS pre-cast bf16 operands (8x128x2 vregs) but v5e
rejects packed bf16 `cmpf`. The lo/hi values fit int16 (and int8): if v5e
supports packed `cmpi`, the compare half of the VPU-roofline build cost
drops 2-4x. Variants on the grouped folded dyn shape (196k pts), verified
against the shipped kernel:

  A. int32 compares (shipped) — baseline.
  B. int16 compares (iota/lo/hi pre-cast i16; select f32->bf16 unchanged).
  C. int8 compares (lo < 128, hi < 64 fit).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r4f.py
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


def make_kernel(cmp_dtype):
    def kernel(idx_ref, wgt_ref, tab_ref, out_ref, *, nc, n_levels, f_out):
        hfp = tab_ref.shape[1] // n_levels
        rp, bn = out_ref.shape
        hi_n = hfp // f_out
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_LANE, bn), 0)
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (hfp, bn), 0) // f_out
        if cmp_dtype is not None:
            iota_lo = iota_lo.astype(cmp_dtype)
            iota_h = iota_h.astype(cmp_dtype)

        accs = []
        for li in range(n_levels):
            tab = tab_ref[0, li * hfp:(li + 1) * hfp, :].astype(jnp.bfloat16)
            ohs, his = [], []
            for ci in range(nc):
                idx = idx_ref[0, li * nc + ci, :]
                wgt = wgt_ref[0, li * nc + ci, :]
                lo = idx & (_LANE - 1)
                hi = idx >> 7
                if cmp_dtype is not None:
                    lo = lo.astype(cmp_dtype)
                    hi = hi.astype(cmp_dtype)
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


def run_variant(name, spec, table, xs, ws, cmp_dtype, want=None):
    v, n = xs.shape[0], xs.shape[1]
    b = ws.shape[1]
    fp = spec.n_features // b
    spec_f = ho._folded_spec(spec, b)
    l = spec_f.n_levels
    r_max = ho._r_max(spec_f)
    hfp = (r_max // _LANE) * fp
    rp = ((l * fp + 7) // 8) * 8
    bn = 512
    kern = make_kernel(cmp_dtype)

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
            functools.partial(kern, nc=nc, n_levels=l, f_out=fp),
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
            print(f"{name} max|diff| {d:.2e}", flush=True)
        timeit(f"{name} fwd", f, table, xs, reps=20)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:200]})",
              flush=True)


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
    timeit("shipped (i32 cmp)", fs, table, xs, reps=20)

    run_variant("A i32", spec, table, xs, ws, None, want=want)
    run_variant("B i16", spec, table, xs, ws, jnp.int16, want=want)
    run_variant("C i8", spec, table, xs, ws, jnp.int8, want=want)
    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
