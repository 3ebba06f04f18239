"""Headline benchmark: full-model training throughput on one chip.

Measures rays/sec of the COMPLETE jitted LiDAR4D train step — 1024 rays/step
with the composite loss including the batch chamfer CD and the
flow-consistency loss over cached full-frame point clouds
(model/runner.py:166-377) — on a synthetic full-size sequence (66 x 1030
range images, 51 frames, the KITTI-360 shape).

Default = the TPU-flagship field configuration (hierarchical 64+128
sampling, one-hot MXU encoders; configs/kitti360_4950_tpu.txt). Pass
`--reference` for the reference-parity architecture (768 uniform samples,
2^19-row gather tables) — measured 67 rays/s on v5e (r1): XLA executes its
random gathers at ~7-18 ns/index and scatters at ~100 ns/update, which is
the motivation for the flagship design (README "TPU design notes").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` divides by REF_RAYS_PER_SEC, a provisional estimate of the
reference CUDA implementation's training throughput (the reference publishes
no speed numbers — SURVEY.md §6): ~5 steps/s x 1024 rays on an A100-class
GPU for tiny-cuda-nn hash-grid LiDAR-NeRF pipelines at this sample count.
Replace with a measured number when the harness measures the reference side.
"""

import json
import os
import sys
import time

import numpy as np

REF_RAYS_PER_SEC = 5000.0

H, W, FRAMES = 66, 1030, 51
SEQ = "9000"
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "bench_synth")
CACHE = os.path.join(ROOT, "flow_cache.npz")

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


def get_flow_cache(refine_ds, scale):
    from lidar4d_tpu.train.flow_cache import build_flow_cache

    if os.path.exists(CACHE):
        z = np.load(CACHE)
        return {k: z[k] for k in z.files}
    cache = build_flow_cache(refine_ds, scale, FRAMES)
    np.savez_compressed(CACHE, **cache)
    return cache


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
    cache = jax.tree.map(jnp.asarray, get_flow_cache(refine_ds, scale))

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
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REF_RAYS_PER_SEC, 3),
        "detail": {
            "backend": jax.default_backend(),
            "config": "reference" if reference else "tpu_flagship",
            "num_rays": NUM_RAYS,
            "samples_per_ray": (num_coarse + num_fine) or num_steps,
            "step_ms": round(1000 * dt / ITERS, 2),
            "setup_s": round(setup_s, 1),
            "loss": loss_val,
            "notes": (
                "flagship hier 128+256 beats uniform-768 parity on converged "
                "A/B (CD -9.2%, F +1.0%, PERF.md); fast mode 64+128 via "
                "LIDAR4D_BENCH_SAMPLES trades ~9% CD for ~1.8x rays/s; "
                "setup_s is axon chip-claim handshake, not compile"
            ),
        },
    }))


if __name__ == "__main__":
    main()
