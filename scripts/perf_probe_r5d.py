"""Round-5 probe, part D — plane_hash_scales INTERMEDIATE points.

The (2,11) winner from r5a (88.9 ms vs 101.5-102.1 dense) FAILED its ep14
quality gate: CD 0.3074 / F 0.8072 vs the dense arm's 0.2864 / 0.8188
(workspace/ab6_flagship_phash211) — +0.021 CD, 3.5x the ±0.006 run-noise
band; 8x/32x compression of the static detail planes costs real quality.
This probe prices the intermediate compression points so the quality
re-gate targets the best remaining speed candidate:

  (1,11): only 256^2 hashed, 32x   (1,12): only 256^2 hashed, 16x
  (2,12): 128^2 8x + 256^2 16x     (2,13): 128^2 2x + 256^2 8x

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r5d.py
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
    for k, b in [(1, 11), (1, 12), (2, 12), (2, 13)]:
        c = dataclasses.replace(cfg, plane_hash_scales=k, plane_hash_log2=b)
        time_step(f"hash_scales={k} log2={b}", LiDAR4DField(c), opt_cfg,
                  frames, cache)

    base2 = time_step("base again (drift check)", LiDAR4DField(cfg), opt_cfg,
                      frames, cache)
    print(f"drift: {base:.1f} -> {base2:.1f} ms", flush=True)
    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
