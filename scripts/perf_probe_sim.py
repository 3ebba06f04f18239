"""Round-5 probe — simulator frames/sec (VERDICT r4 #5: the BASELINE.md:50
"interactive rates" axis nobody had measured).

Measures steady-state s/frame of the novel-view render at two sensor
configs on the flagship field (one-hot tables, hier 128+256 — the exact
trainer eval path), comparing:

  * per-frame render_staged (the r4 path: one dispatch per frame), vs
  * render_frames_staged (r5: all frames' chunks on one mapped axis,
    per-chunk scalar time — one executable, no host round-trips).

Sensor configs: KITTI-360 native 66x1030 (67,980 rays/frame) and the
kitti2nus preset 32x1024 (32,768 rays/frame, main_lidar4d_sim.py:184-190).
Random-init params (render cost is weight-independent). First call per
executable is compile; steady-state = the timed repeat.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_sim.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
from lidar4d_tpu.models.renderer import render_frames_staged, render_staged
from lidar4d_tpu.sim.simulator import build_novel_rays

NUM_COARSE, NUM_FINE = 128, 256
CHUNK = 16384
FRAME_BATCH = 4


def measure(name, fn, sync):
    t0 = time.perf_counter()
    sync(fn())
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(fn())
    warm = time.perf_counter() - t0
    print(f"{name}: warm {warm:.2f}s (cold {cold:.1f}s)", flush=True)
    return warm


def main():
    print("backend:", jax.default_backend(), flush=True)
    _, _, scale = bench.get_dataset()
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

    rng = np.random.default_rng(0)
    for label, H, W in (("kitti2nus 32x1024", 32, 1024),
                        ("native 66x1030", 66, 1030)):
        poses = np.tile(np.eye(4, dtype=np.float32), (FRAME_BATCH, 1, 1))
        poses[:, :3, 3] = rng.normal(size=(FRAME_BATCH, 3)).astype(
            np.float32) * 0.05
        fov = (10.0, 40.0) if H == 32 else (2.0, 26.9)
        rays_o, rays_d = build_novel_rays(poses, H, W, fov)
        ro, rd = jnp.asarray(rays_o), jnp.asarray(rays_d)
        times = jnp.linspace(0.0, 1.0, FRAME_BATCH)

        print(f"=== {label}: {H * W} rays/frame, "
              f"{(NUM_COARSE + NUM_FINE) * H * W / 1e6:.1f}M samples/frame",
              flush=True)

        w1 = measure(
            f"  per-frame render_staged x{FRAME_BATCH}",
            lambda: [render_staged(field, params, ro[i], rd[i], times[i],
                                   num_steps=768, chunk=CHUNK,
                                   num_coarse=NUM_COARSE, num_fine=NUM_FINE)
                     for i in range(FRAME_BATCH)],
            lambda outs: [float(jnp.sum(o["depth_lidar"])) for o in outs],
        )
        w2 = measure(
            f"  render_frames_staged batch={FRAME_BATCH}",
            lambda: render_frames_staged(field, params, ro, rd, times,
                                         num_steps=768, chunk=CHUNK,
                                         num_coarse=NUM_COARSE,
                                         num_fine=NUM_FINE),
            lambda o: float(jnp.sum(o["depth_lidar"])),
        )
        print(f"  -> per-frame {w1 / FRAME_BATCH:.2f} s/frame, "
              f"batched {w2 / FRAME_BATCH:.2f} s/frame "
              f"({w1 / max(w2, 1e-9):.2f}x)", flush=True)

    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
