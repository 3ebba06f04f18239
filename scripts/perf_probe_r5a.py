"""Round-5 probe, part A — plane_hash_scales step-time A/B on the flagship
train step (1024 rays x 128+256, full losses, the exact bench.py setup).

Context (PERF.md r4 post-gather attribution): planes static is the #1 step
component at ~22.9 ms; its dense per-sample one-hot bilinear costs ~C*H*W
MACs/sample and the 256^2 top scale dominates. `Planes4D.hash_scales`
(shipped r4, default 0) replaces the top-k scales' static planes with
[2^b, C] spatial-hash tables riding the factorized gather kernel, whose
VPU cost is table-size-independent.

Flagship static plane sizes are 32^2/64^2/128^2/256^2 (min_resolution=32,
multiscale 1/2/4/8), and hashing only engages where reso^2 > 2^b, so:
  - k=1, b=14: top scale only, 65,536 verts -> 16,384 rows (4x, mildest
    quality risk; 2^14 is the factorized kernel's eligibility bound)
  - k=2, b=11: 128^2+256^2 -> 2,048 rows each (8x/32x)
  - k=3, b=11: adds 64^2 -> 2,048 (2x)
Same-process A/B (shared tunnel-sync constant), drift check at the end.
If the win is real, the quality gate before flipping the flagship config
is the matched-step ep14 CD/F A/B (configs/bench_ab_flagship_ep14.txt
with --plane_hash_scales).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r5a.py
"""

import dataclasses

import jax
import jax.numpy as jnp

import bench
from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
from scripts.perf_probe_r4d import time_step


def main():
    print("backend:", jax.default_backend(), flush=True)
    ds, refine_ds, scale = bench.get_dataset()
    cache = jax.tree.map(jnp.asarray, bench.get_flow_cache(refine_ds, scale))
    frames = [jax.tree.map(jnp.asarray, ds.frame(i)) for i in range(len(ds))]

    from lidar4d_tpu.train.losses import LossConfig

    loss_cfg = LossConfig(flow_loss=True, grad_loss=True, scale=scale,
                          num_frames=bench.FRAMES, iters=30000)
    opt_cfg = (loss_cfg, scale)

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

    base = time_step("base (dense planes)", LiDAR4DField(cfg), opt_cfg,
                     frames, cache)
    for k, b in ((1, 14), (2, 11), (3, 11)):
        c = dataclasses.replace(cfg, plane_hash_scales=k, plane_hash_log2=b)
        time_step(f"hash_scales={k} log2={b}", LiDAR4DField(c), opt_cfg,
                  frames, cache)
    base2 = time_step("base again (drift check)", LiDAR4DField(cfg), opt_cfg,
                      frames, cache)
    print(f"drift: {base:.1f} -> {base2:.1f} ms", flush=True)
    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
