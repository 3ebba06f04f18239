"""Headline benchmark: full-model training throughput on one chip.

Measures rays/sec of the COMPLETE jitted LiDAR4D train step — reference
hyperparameters (1024 rays x 768 samples, run_kitti_lidar4d.sh:4-6; full-size
hash/planes/flow encoders) with the composite loss including the batch
chamfer CD and the flow-consistency loss over cached full-frame point clouds
(model/runner.py:166-377) — on a synthetic full-size sequence (66 x 1030
range images, 51 frames, the KITTI-360 shape).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` divides by REF_RAYS_PER_SEC, a provisional estimate of the
reference CUDA implementation's training throughput (the reference publishes
no speed numbers — SURVEY.md §6): ~5 steps/s x 1024 rays on an A100-class
GPU for tiny-cuda-nn hash-grid LiDAR-NeRF pipelines at this sample count.
Replace with a measured number when the harness measures the reference side.
"""

import json
import os
import time

import numpy as np

REF_RAYS_PER_SEC = 5000.0

H, W, FRAMES = 66, 1030, 51
SEQ = "9000"
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "bench_synth")
CACHE = os.path.join(ROOT, "flow_cache.npz")

NUM_RAYS = 1024
NUM_STEPS = 768
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

    t_setup = time.perf_counter()
    ds, refine_ds, scale = get_dataset()
    cache = jax.tree.map(jnp.asarray, get_flow_cache(refine_ds, scale))

    cfg = LiDAR4DConfig(
        num_frames=FRAMES,
        near_lidar=1.0 * scale,
        far_lidar=81.0 * scale,
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
        num_rays=NUM_RAYS, num_steps=NUM_STEPS, patch_size=1,
    )

    frames = [jax.tree.map(jnp.asarray, ds.frame(i)) for i in range(len(ds))]
    key = jax.random.PRNGKey(1)
    for i in range(WARMUP):
        key, k = jax.random.split(key)
        state, metrics = step(state, frames[i % len(frames)], cache, k)
    jax.block_until_ready(metrics["loss"])
    setup_s = time.perf_counter() - t_setup

    t0 = time.perf_counter()
    for i in range(ITERS):
        key, k = jax.random.split(key)
        state, metrics = step(state, frames[i % len(frames)], cache, k)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = ITERS * NUM_RAYS / dt
    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / REF_RAYS_PER_SEC, 3),
        "detail": {
            "backend": jax.default_backend(),
            "num_rays": NUM_RAYS, "num_steps": NUM_STEPS,
            "step_ms": round(1000 * dt / ITERS, 2),
            "setup_s": round(setup_s, 1),
            "loss": float(metrics["loss"]),
        },
    }))


if __name__ == "__main__":
    main()
