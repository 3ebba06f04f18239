"""Round-4 probe, part G — plane_linear restructurings + single-vreg gather.

planes_dyn costs 24.7 ms of the 116 ms step (probe r4d) and plane_linear
issues M=8 matmuls ([C=8, Sp] x [Sp, BN]) — ~27k per step. Candidates:

  A. take_along_axis on EXACTLY one vreg: tab [8, 128], idx [8, 128],
     axis=1 — PERF.md's primitive table says this single-vreg form is the
     one Mosaic supports (the r4b probe used 4-vreg index blocks and
     failed; this pins the documented shape).
  B. plane_linear mirror (shipped form) vs block-diagonal P-batching
     (ONE [P*C, P*Sp] x [P*Sp, BN] matmul per block, P=9 = variants*axes).
  C. gather-based plane_linear for Sp <= 128 (if A lowers): two lane
     gathers + lerp instead of tent build + matmul.
  D. in-step base re-time (folded backward landed since r4d's 116.1 ms).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r4g.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_BN = 512


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


def probe_single_vreg_gather():
    def gk(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    tab = jax.random.normal(jax.random.PRNGKey(0), (8, 128))
    idx = jax.random.randint(jax.random.PRNGKey(1), (8, 128), 0, 128)
    try:
        f = pl.pallas_call(
            gk,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )
        out = f(tab, idx)
        want = jnp.take_along_axis(tab, idx, axis=1)
        d = float(jnp.abs(out - want).max())
        print(f"single-vreg take_along_axis [8,128]: "
              f"{'OK' if d == 0 else f'WRONG {d:.1e}'}", flush=True)
        return d == 0.0
    except Exception as e:  # noqa: BLE001
        print(f"single-vreg take_along_axis [8,128]: UNSUPPORTED "
              f"({type(e).__name__}: {str(e)[:160]})", flush=True)
        return False


# ---------------------------------------------------------- plane_linear A/Bs
def _tent_t(u, size, bn):
    iota = jax.lax.broadcasted_iota(jnp.int32, (size, bn), 0).astype(
        jnp.float32)
    d = iota - u[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(d)).astype(jnp.bfloat16)


def _lin_fwd_kernel(crd_ref, g_ref, out_ref):
    bn = crd_ref.shape[2]
    sp = g_ref.shape[2]
    oht = _tent_t(crd_ref[0, 0, :], sp, bn)
    out_ref[0] = jax.lax.dot_general(
        g_ref[0].astype(jnp.bfloat16), oht, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def plane_linear_mirror(grid, x):
    p, c, w = grid.shape
    n = x.shape[1]
    sp = max(((w + _LANE - 1) // _LANE) * _LANE, _LANE)
    if sp != w:
        grid = jnp.pad(grid, ((0, 0), (0, 0), (0, sp - w)))
    u = (jnp.clip(x, 0.0, 1.0) * (w - 1)).astype(jnp.float32)[:, None, :]
    npad = ((n + _BN - 1) // _BN) * _BN
    if npad != n:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, npad - n)))
    out = pl.pallas_call(
        _lin_fwd_kernel,
        grid=(p, npad // _BN),
        in_specs=[
            pl.BlockSpec((1, 1, _BN), lambda pi, b: (pi, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, sp), lambda pi, b: (pi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, _BN), lambda pi, b: (pi, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c, npad), jnp.float32),
    )(u, grid)
    return out[:, :, :n].transpose(0, 2, 1)


def _lin_bd_kernel(crd_ref, g_ref, out_ref, *, p, sp):
    bn = crd_ref.shape[1]
    tents = [
        _tent_t(crd_ref[pi, :], sp, bn) for pi in range(p)
    ]
    rhs = jnp.concatenate(tents, axis=0)        # [P*Sp, BN]
    out_ref[:] = jax.lax.dot_general(
        g_ref[:].astype(jnp.bfloat16), rhs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                           # [P*C, BN]


def plane_linear_blockdiag(grid, x):
    p, c, w = grid.shape
    n = x.shape[1]
    sp = max(((w + _LANE - 1) // _LANE) * _LANE, _LANE)
    if sp != w:
        grid = jnp.pad(grid, ((0, 0), (0, 0), (0, sp - w)))
    # [P*C, P*Sp] block-diagonal
    blocks = []
    for pi in range(p):
        row = [jnp.zeros((c, sp), grid.dtype)] * p
        row[pi] = grid[pi]
        blocks.append(jnp.concatenate(row, axis=1))
    g_bd = jnp.concatenate(blocks, axis=0)
    u = (jnp.clip(x, 0.0, 1.0) * (w - 1)).astype(jnp.float32)
    npad = ((n + _BN - 1) // _BN) * _BN
    if npad != n:
        u = jnp.pad(u, ((0, 0), (0, npad - n)))
    out = pl.pallas_call(
        functools.partial(_lin_bd_kernel, p=p, sp=sp),
        grid=(npad // _BN,),
        in_specs=[
            pl.BlockSpec((p, _BN), lambda b: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p * c, p * sp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p * c, _BN), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p * c, npad), jnp.float32),
    )(u, g_bd)
    return out.reshape(p, c, npad)[:, :, :n].transpose(0, 2, 1)


def _lin_gather_kernel(crd_ref, g_ref, out_ref, *, bn):
    # g [1, C=8, 128] is ONE vreg; gather both tent corners along lanes
    u = crd_ref[0, 0, :]                       # [BN]
    j0 = jnp.floor(u).astype(jnp.int32)
    sp = g_ref.shape[2]
    j0 = jnp.clip(j0, 0, sp - 1)
    j1 = jnp.minimum(j0 + 1, sp - 1)
    f = u - j0.astype(jnp.float32)
    tab = g_ref[0]
    outs = []
    for s in range(bn // _LANE):
        sl = slice(s * _LANE, (s + 1) * _LANE)
        i0 = jnp.broadcast_to(j0[sl][None, :], (8, _LANE))
        i1 = jnp.broadcast_to(j1[sl][None, :], (8, _LANE))
        g0 = jnp.take_along_axis(tab, i0, axis=1)
        g1 = jnp.take_along_axis(tab, i1, axis=1)
        ff = f[sl][None, :]
        outs.append((1.0 - ff) * g0 + ff * g1)
    out_ref[0] = jnp.concatenate(outs, axis=1)


def plane_linear_gather(grid, x):
    p, c, w = grid.shape
    assert c == 8 and w <= _LANE
    n = x.shape[1]
    if w != _LANE:
        grid = jnp.pad(grid, ((0, 0), (0, 0), (0, _LANE - w)))
    u = (jnp.clip(x, 0.0, 1.0) * (w - 1)).astype(jnp.float32)[:, None, :]
    npad = ((n + _BN - 1) // _BN) * _BN
    if npad != n:
        u = jnp.pad(u, ((0, 0), (0, 0), (0, npad - n)))
    out = pl.pallas_call(
        functools.partial(_lin_gather_kernel, bn=_BN),
        grid=(p, npad // _BN),
        in_specs=[
            pl.BlockSpec((1, 1, _BN), lambda pi, b: (pi, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, _LANE), lambda pi, b: (pi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, _BN), lambda pi, b: (pi, 0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, c, npad), jnp.float32),
    )(u, grid)
    return out[:, :, :n].transpose(0, 2, 1)


def main():
    print("backend:", jax.default_backend(), flush=True)
    ok = probe_single_vreg_gather()

    n = 196608
    p, c = 9, 8
    for s in (128, 256):
        grid = jax.random.normal(jax.random.PRNGKey(2), (p, c, s))
        x = jax.random.uniform(jax.random.PRNGKey(3), (p, n))
        fm = jax.jit(plane_linear_mirror)
        want = fm(grid, x)
        timeit(f"plane_linear mirror S={s}", fm, grid, x)
        fb = jax.jit(plane_linear_blockdiag)
        got = fb(grid, x)
        print(f"blockdiag S={s} max|diff| "
              f"{float(jnp.abs(got - want).max()):.2e}", flush=True)
        timeit(f"plane_linear blockdiag S={s}", fb, grid, x)
        if ok and s <= _LANE:
            fg = jax.jit(plane_linear_gather)
            try:
                got = fg(grid, x)
                print(f"gather S={s} max|diff| "
                      f"{float(jnp.abs(got - want).max()):.2e}", flush=True)
                timeit(f"plane_linear gather S={s}", fg, grid, x)
            except Exception as e:  # noqa: BLE001
                print(f"gather S={s}: FAILED ({str(e)[:160]})", flush=True)

    # in-step base re-time with the folded backward
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
    for i in range(2):
        key, k = jax.random.split(key)
        state, metrics = step(state, frames[i % len(frames)], cache, k)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(7):
        key, k = jax.random.split(key)
        state, metrics = step(state, frames[i % len(frames)], cache, k)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / 7 * 1000
    print(f"base step w/ folded bwd: {dt:.1f} ms/step "
          f"({1024 * 1000 / dt:.0f} rays/s) [r4d base was 116.1]",
          flush=True)
    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
