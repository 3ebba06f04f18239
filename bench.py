"""Headline benchmark: full-model training throughput on one chip.

Measures rays/sec of the COMPLETE jitted LiDAR4D train step — 1024 rays/step
with the composite loss including the batch chamfer CD and the
flow-consistency loss over cached full-frame point clouds
(model/runner.py:166-377) — on a synthetic full-size sequence (66 x 1030
range images, 51 frames, the KITTI-360 shape).

Default = the TPU-flagship field configuration (hierarchical 128+256
sampling, one-hot MXU encoders; configs/kitti360_4950_tpu.txt). Pass
`--reference` for the reference-parity architecture (768 uniform samples,
2^19-row gather tables) — measured 67 rays/s on v5e (r1): XLA executes its
random gathers at ~7-18 ns/index and scatters at ~100 ns/update, which is
the motivation for the flagship design (README "TPU design notes").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` divides by REF_RAYS_PER_SEC, a derived estimate of the
reference CUDA implementation's training throughput (the reference publishes
no speed numbers — SURVEY.md §6). The derivation ("PERF.md: Round 5 —
reference-side baseline derivation") counts the reference step's encoder
corner-reads / MLP flops / chamfer work from its source and brackets the
step time with a roofline floor, a fused-tcnn throughput anchor, and an
eager-pipeline tail: central ~7,000 rays/s (145 ms/step on the 4090/A100
class). REF_RAYS_PER_SEC_RANGE spans the residual fused-vs-eager
uncertainty and `vs_baseline_range` in the JSON carries the resulting band,
so the CUDA comparison can be bounded from the JSON alone.

The detail block also reports an analytic FLOP model of the step (see
`flop_model`): `useful_gflops` counts the logical math (each table lookup at
its corner-MAC cost, MLPs, chamfer, compositing), `executed_gflops` adds
the one-hot matmul padding the MXU actually executes (a [*, R] one-hot
contraction does R/corners times the logical work — the design trades those
"zero FLOPs" for never touching HBM with indices). MFU numbers divide by
the v5e bf16 peak (197 TFLOP/s): `mfu_executed` is how busy the MXU is,
`mfu_useful` is how much of that is logical work — the honest number.
"""

import json
import os
import sys
import time

import numpy as np

# Reference throughput denominator: derived component model of the CUDA
# reference's step (encode-traffic op counts from the reference source x
# published GPU-class characteristics, bracketed by a roofline floor, a
# fused-tcnn throughput anchor, and an eager-pipeline tail) — see
# "PERF.md: Round 5 — reference-side baseline derivation". Replaces the
# r1-r4 flat 5,000 [2,500, 10,000] guess (which sat inside this band).
REF_RAYS_PER_SEC = 7000.0
REF_RAYS_PER_SEC_RANGE = (4000.0, 14000.0)
V5E_BF16_PEAK_TFLOPS = 197.0

H, W, FRAMES = 66, 1030, 51
SEQ = "9000"
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "bench_synth")

# Ray batch. Measured r2 scaling curve is FLAT (1024 rays: 2855 rays/s,
# 4096 rays: 2915 rays/s) — the step is compute-bound on the one-hot encoder
# builds, whose cost is linear in sample count, so bigger batches buy
# nothing. Default 1024 matches the reference schedule
# (run_kitti_lidar4d.sh:6) and keeps bench wall-clock low; override with
# --rays N or LIDAR4D_BENCH_RAYS.
NUM_RAYS = int(os.environ.get("LIDAR4D_BENCH_RAYS", "1024"))
WARMUP = 2
ITERS = 5


def get_dataset():
    from lidar4d_tpu.data.kitti360 import KITTI360Dataset
    from lidar4d_tpu.data.synthetic import generate_synthetic_sequence

    meta = os.path.join(ROOT, "meta.json")
    if not os.path.exists(meta):
        scale, offset = generate_synthetic_sequence(
            ROOT, sequence_id=SEQ, num_frames=FRAMES, H=H, W=W, seed=0
        )
        with open(meta, "w") as f:
            json.dump({"scale": scale, "offset": offset}, f)
    with open(meta) as f:
        m = json.load(f)
    ds = KITTI360Dataset(
        split="train", root_path=ROOT, sequence_id=SEQ,
        scale=m["scale"], offset=m["offset"], num_rays_lidar=NUM_RAYS,
    )
    refine_ds = KITTI360Dataset(
        split="refine", root_path=ROOT, sequence_id=SEQ,
        scale=m["scale"], offset=m["offset"],
    )
    return ds, refine_ds, m["scale"]


def get_flow_cache(refine_ds, scale, cap=65536):
    """Flow-loss clouds at the selected arm's training cap: 65536 for the
    flagship (configs/kitti360_4950_tpu.txt) and 16384 for --reference
    (bench_ab_parityarch*.txt) — each bench row must pay exactly the flow-
    cloud size its training runs pay (ADVICE r3). Shares the trainer's
    cache file (train/trainer.py:_load_or_build_flow_cache naming)."""
    from lidar4d_tpu.train.flow_cache import build_flow_cache

    fn = os.path.join(
        ROOT, f"flow_cache_{SEQ}_cap{cap}_s{float(scale):.8g}_f{FRAMES}.npz"
    )
    if os.path.exists(fn):
        z = np.load(fn)
        return {k: z[k] for k in z.files}
    cache = build_flow_cache(refine_ds, scale, FRAMES, max_points=cap)
    np.savez_compressed(fn, **cache)
    return cache


def _pad128(r):
    return ((r + 127) // 128) * 128


def flop_model(field, params, num_rays, n_samples, cloud_p, cloud_pg,
               num_coarse=0, num_fine=0):
    """Analytic per-step FLOP count: (useful_gflops, executed_gflops).

    useful = the logical math: every table lookup at its corner-MAC cost
    (2^d corners x F features x 2 flops), MLPs at 2*in*out, the chamfer
    distance matrices, compositing. Backward counted as 1x forward for
    table lookups (the gradient is the transposed contraction) and 2x for
    MLPs; the flow-warp neighbor encodes are forward-only (no_grad).

    executed = useful + the one-hot padding: on the MXU a lookup into an
    R-row table is a [*, R] matmul (R/2^d times the logical MACs), and a
    bilinear plane sample contracts the whole padded H x W plane. This is
    the deliberate design trade (PERF.md): ~free zero-multiplies on the MXU
    instead of 7-100 ns/index serialized gather/scatter through HBM.

    Excluded (small or non-MXU): frequency encode sin/cos, sort/argsort,
    sample_pdf, optimizer/EMA elementwise, loss reductions. Chamfer is
    counted at its matmul FLOPs but executes as a 3-pass scan with argmin,
    so its wall-clock exceeds what the FLOPs predict.
    """
    enc = field.hash_encoder
    pl_enc = field.planes_encoder
    useful = 0.0
    execd = 0.0

    def hash_cost(spec, n_pts, n_fwd_variants=1.0, bwd_variants=1.0):
        from lidar4d_tpu.ops.hash_onehot import FACT_MAX_ROWS, onehot_eligible

        nonlocal useful, execd
        corners = 2 ** spec.n_dims
        f = spec.n_features
        u = sum(corners * f * 2 for _ in spec.table_sizes)
        if onehot_eligible(spec, FACT_MAX_ROWS):
            # one-hot MXU dispatch: each lookup executes an R-row matmul
            e = sum(_pad128(r) * f * 2 * corners for r in spec.table_sizes)
        else:
            # gather path: executed flops = the logical corner MACs (the
            # cost lives in serialized HBM gathers/scatters, not the MXU)
            e = u
        useful += n_pts * u * (n_fwd_variants + bwd_variants)
        execd += n_pts * e * (n_fwd_variants + bwd_variants)

    n = num_rays * n_samples
    # hash static (fwd + table-grad bwd)
    hash_cost(enc.static_spec, n)
    # hash dynamic: 3 planes, 3 time variants fwd, variant-0 bwd only
    for p in range(3):
        hash_cost(enc.dynamic_spec(p), n, n_fwd_variants=3.0, bwd_variants=1.0)
    # flow grid (3D corners) at the density points + flow MLP
    if field.flow_net.use_grid:
        hash_cost(field.flow_net.grid_spec, n)

    def mlp_flops(tree):
        import jax as _jax

        return sum(
            2.0 * np.prod(np.shape(w)) for w in _jax.tree.leaves(tree)
            if np.ndim(w) == 2
        )

    # K-planes static: 3 planes/scale, 4-corner bilinear; tables-only bwd
    for scale in pl_enc.multiscale_res:
        h = pl_enc.resolution[0] * scale
        c = pl_enc.output_dim
        useful += n * 3 * 4 * c * 2 * 2                     # fwd + bwd
        execd += n * 3 * max(h, 8) * _pad128(h) * c * 2 * 2
        # dynamic (time-collapsed 1-D): 2-corner interp, 3 variants fwd,
        # all differentiable (bwd ~= 2x fwd: tables + coord grads)
        useful += n * 3 * 2 * c * 2 * (3 + 6)
        execd += n * 3 * h * c * 2 * (3 + 6)

    # MLPs: sigma + 2 heads on every sample; flow MLP on density pts (x3
    # variants fwd, x1 bwd) and on the flow-loss clouds
    useful += n * (mlp_flops(params["sigma"])
                   + mlp_flops(params["intensity"])
                   + mlp_flops(params["raydrop"])) * 3.0
    flow_mlp = mlp_flops(
        {k: v for k, v in params["flow"].items() if k != "grid"}
    )
    useful += n * flow_mlp * 4.0
    useful += (cloud_p + cloud_pg) * flow_mlp * 3.0
    execd += n * (mlp_flops(params["sigma"]) + mlp_flops(params["intensity"])
                  + mlp_flops(params["raydrop"])) * 3.0
    execd += n * flow_mlp * 4.0 + (cloud_p + cloud_pg) * flow_mlp * 3.0

    # chamfer matmul flops: batch CD (rays x rays) + flow loss (4 pairs,
    # P x P, fwd+bwd both ways)
    cham = (num_rays * num_rays + 4 * cloud_p * cloud_p) * 3 * 2 * 2 * 2.0
    useful += cham
    execd += cham
    # compositing & misc elementwise
    useful += n * 20.0
    execd += n * 20.0

    # hierarchical-sampling one-hot contractions (PERF.md r3 tail rewrites):
    # the coarse/fine rank-merge applies its permutation as a [T,T]x[T,17]
    # matmul per ray (fwd + bwd), and sample_pdf's four lookups are one
    # [S,C]x[C,4] contraction. Logically both are data movement (0 useful
    # FLOPs) — pure one-hot padding the MXU executes.
    if num_coarse and num_fine:
        t_tot = num_coarse + num_fine
        execd += num_rays * t_tot * t_tot * 17.0 * 2.0 * 2.0
        execd += num_rays * num_fine * num_coarse * 4.0 * 2.0 * 2.0
    return useful / 1e9, execd / 1e9


def main():
    import jax
    import jax.numpy as jnp

    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
    from lidar4d_tpu.train.losses import LossConfig
    from lidar4d_tpu.train.train_step import init_train_state, make_train_step
    from lidar4d_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    reference = "--reference" in sys.argv
    global NUM_RAYS
    if "--rays" in sys.argv:
        NUM_RAYS = int(sys.argv[sys.argv.index("--rays") + 1])

    t_setup = time.perf_counter()
    ds, refine_ds, scale = get_dataset()
    cache = jax.tree.map(
        jnp.asarray,
        get_flow_cache(refine_ds, scale, cap=16384 if reference else 65536),
    )

    if reference:
        num_steps, num_coarse, num_fine = 768, 0, 0
        cfg = LiDAR4DConfig(
            num_frames=FRAMES, near_lidar=1.0 * scale, far_lidar=81.0 * scale,
        )
    else:  # TPU flagship (configs/kitti360_4950_tpu.txt field shape)
        # hier 128+256: the converged-A/B winner — CD 0.1747 / F 0.8762 vs
        # uniform-768's 0.1925 / 0.8678 on the bench scene (PERF.md), at
        # 5.9x the parity arm's rays/s. Override the sample split with
        # LIDAR4D_BENCH_SAMPLES=coarse,fine (e.g. 64,128 for the fast point).
        import os as _os
        _c, _f = (_os.environ.get('LIDAR4D_BENCH_SAMPLES') or '128,256').split(',')
        num_steps, num_coarse, num_fine = 768, int(_c), int(_f)
        cfg = LiDAR4DConfig(
            num_frames=FRAMES, near_lidar=1.0 * scale, far_lidar=81.0 * scale,
            n_levels_hash=6, n_features_per_level_hash=8,
            log2_hashmap_size=11, base_resolution=64, max_resolution=2048,
            hash_size_dynamic=(11, 10, 10),
            flow_n_levels=4, flow_n_features=8, flow_log2_hashmap_size=11,
            flow_base_resolution=16, flow_max_resolution=256,
            # r5 flip: 256^2 static plane hash-compressed to 2^11 rows —
            # -12.2 ms/step at BETTER converged quality (CD 0.1626 vs
            # 0.1810, runs/ab6_conf_phash111; PERF.md r5d).
            plane_hash_scales=1, plane_hash_log2=11,
            remat_density=False, density_chunk=0,
        )
    field = LiDAR4DField(cfg)
    loss_cfg = LossConfig(
        flow_loss=True, grad_loss=True, scale=scale, num_frames=FRAMES,
        iters=30000,
    )
    state, opt = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2,
                                  iters=30000)
    step = make_train_step(
        field, opt, loss_cfg, H=H, W=W, fov_lidar=(2.0, 26.9),
        num_rays=NUM_RAYS, num_steps=num_steps, patch_size=1,
        num_coarse=num_coarse, num_fine=num_fine,
    )

    frames = [jax.tree.map(jnp.asarray, ds.frame(i)) for i in range(len(ds))]
    key = jax.random.PRNGKey(1)
    for i in range(WARMUP):
        key, k = jax.random.split(key)
        state, metrics = step(state, frames[i % len(frames)], cache, k)
    # device->host transfer: the only reliable completion sync on a tunneled
    # backend (block_until_ready returns early there)
    float(metrics["loss"])
    setup_s = time.perf_counter() - t_setup

    t0 = time.perf_counter()
    for i in range(ITERS):
        key, k = jax.random.split(key)
        state, metrics = step(state, frames[i % len(frames)], cache, k)
    loss_val = float(metrics["loss"])  # steps chain on state -> syncs all
    dt = time.perf_counter() - t0

    rays_per_sec = ITERS * NUM_RAYS / dt
    n_samples = (num_coarse + num_fine) or num_steps
    step_s = dt / ITERS

    # analytic FLOP model + MFU (see flop_model docstring)
    cloud_p = int(cache["points"].shape[1])
    cloud_pg = int(cache["ground"].shape[1])
    useful_g, execd_g = flop_model(
        field, state.params, NUM_RAYS, n_samples, cloud_p, cloud_pg,
        num_coarse=num_coarse, num_fine=num_fine,
    )
    peak = V5E_BF16_PEAK_TFLOPS * 1e3  # GFLOP/s
    mfu_useful = useful_g / step_s / peak
    mfu_executed = execd_g / step_s / peak

    # second ray-batch point: scaling evidence in the same JSON (skippable
    # via LIDAR4D_BENCH_SCALING=0 — it costs one extra compile)
    scaling = None
    if os.environ.get("LIDAR4D_BENCH_SCALING", "1") != "0":
        rays2 = 4096 if NUM_RAYS != 4096 else 1024
        step2 = make_train_step(
            field, opt, loss_cfg, H=H, W=W, fov_lidar=(2.0, 26.9),
            num_rays=rays2, num_steps=num_steps, patch_size=1,
            num_coarse=num_coarse, num_fine=num_fine,
        )
        state2, _ = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2,
                                     iters=30000)
        for i in range(WARMUP):
            key, k = jax.random.split(key)
            state2, m2 = step2(state2, frames[i % len(frames)], cache, k)
        float(m2["loss"])
        t0 = time.perf_counter()
        for i in range(3):
            key, k = jax.random.split(key)
            state2, m2 = step2(state2, frames[i % len(frames)], cache, k)
        float(m2["loss"])
        dt2 = time.perf_counter() - t0
        scaling = {"num_rays": rays2,
                   "rays_per_sec": round(3 * rays2 / dt2, 1),
                   "step_ms": round(1000 * dt2 / 3, 2)}

    lo, hi = REF_RAYS_PER_SEC_RANGE
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REF_RAYS_PER_SEC, 3),
        "detail": {
            "backend": jax.default_backend(),
            "config": "reference" if reference else "tpu_flagship",
            "num_rays": NUM_RAYS,
            "samples_per_ray": n_samples,
            "samples_per_sec": round(rays_per_sec * n_samples, 0),
            "step_ms": round(1000 * step_s, 2),
            "setup_s": round(setup_s, 1),
            "loss": loss_val,
            "scaling_point": scaling,
            "flops_per_step_g": {"useful": round(useful_g, 1),
                                 "executed": round(execd_g, 1)},
            "mfu": {"useful": round(mfu_useful, 4),
                    "executed": round(mfu_executed, 4),
                    "peak_tflops_bf16": V5E_BF16_PEAK_TFLOPS},
            "vs_baseline_range": [round(rays_per_sec / hi, 3),
                                  round(rays_per_sec / lo, 3)],
            "baseline_note": (
                f"denominator {REF_RAYS_PER_SEC:.0f} rays/s is a derived "
                "component model of the CUDA reference's step (encode "
                "traffic op counts x GPU-class throughputs; PERF.md r5 "
                "baseline derivation — the reference publishes no speed "
                f"numbers); range [{lo:.0f}, {hi:.0f}] spans the "
                "fused-vs-eager efficiency band"
            ),
            "notes": (
                "flagship hier 128+256 beats uniform-768 parity on converged "
                "A/B (CD -9.2%, F +1.0%, PERF.md); fast mode 64+128 via "
                "LIDAR4D_BENCH_SAMPLES trades ~9% CD for ~1.8x rays/s; "
                "setup_s is axon chip-claim handshake, not compile; "
                "mfu.useful counts logical lookup/MLP/chamfer math, "
                "mfu.executed adds the one-hot matmul padding (flop_model)"
            ),
        },
    }))


if __name__ == "__main__":
    main()
