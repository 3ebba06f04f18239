"""Steady-state eval render time: 10 held-out frames (66x1030) through
render_staged at the trainer's eval chunk (16384), flagship 128+256 field.

The e2e logs lump the first frame's XLA compile into "render" (cold cache:
342 s incl ~275 s compile); in-process, evals after the first reuse the
executable — this measures that steady state (VERDICT r3 #5 asks for the
eval cost a long training run actually pays per eval).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_evaltime.py
"""

import time

import jax
import jax.numpy as jnp

import bench
from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
from lidar4d_tpu.models.renderer import render_staged
from lidar4d_tpu.ops.rays import get_lidar_rays


def main():
    print("backend:", jax.default_backend(), flush=True)
    ds, _refine_ds, scale = bench.get_dataset()
    from lidar4d_tpu.data.kitti360 import KITTI360Dataset

    test_ds = KITTI360Dataset(
        split="val", root_path=bench.ROOT, sequence_id=bench.SEQ,
        scale=scale, offset=[37.499942349791915, -0.00044495854189108286,
                             -0.5599383979129177],
    )
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
    params = field.init(jax.random.PRNGKey(0))
    H, W = test_ds.H_lidar, test_ds.W_lidar
    n_frames = len(test_ds)
    print(f"{n_frames} frames of {H}x{W}", flush=True)

    def render_one(i):
        frame = test_ds.frame(i)
        rays = get_lidar_rays(jnp.asarray(frame["pose"]),
                              test_ds.intrinsics_lidar, H, W, N=-1)
        out = render_staged(
            field, params, rays["rays_o"], rays["rays_d"],
            jnp.float32(frame["time"]), num_steps=768, chunk=16384,
            num_coarse=128, num_fine=256,
        )
        return float(jnp.sum(out["depth_lidar"]))

    t0 = time.perf_counter()
    render_one(0)  # compile + warm
    print(f"frame 0 (incl compile): {time.perf_counter() - t0:.1f} s",
          flush=True)
    t0 = time.perf_counter()
    for i in range(n_frames):
        render_one(i)
    dt = time.perf_counter() - t0
    print(f"steady-state render: {dt:.1f} s / {n_frames} frames "
          f"({dt / n_frames:.2f} s/frame)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
