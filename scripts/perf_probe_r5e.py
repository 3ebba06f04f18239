"""Round-5 probe, part E — forward/backward split ON the flipped flagship.

The r5b split was measured on the DENSE planes config; the flagship has
since flipped to plane_hash_scales=(1,11) (PERF.md r5a/r5d). Before
committing to the shared-corner fused backward for the dynamic families
(the r5c #1 lever), re-measure each family's fwd/bwd halves on the shipped
config so the lever is priced against fresh numbers, not the stale dense
table. Same stop-grad method as r5b (real fwd, backward dropped):

  bwd(component) ~= step(base) - step(stop_grad)

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r5e.py
Override the plane-hash point with PHASH=k,b (default 1,11 — the flagship).
"""

import os

import jax
import jax.numpy as jnp

import bench
from lidar4d_tpu.models.hash_field import HashGrid4D
from lidar4d_tpu.models.planes_field import Planes4D
from lidar4d_tpu.models.flow_field import FlowField
from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
from scripts.perf_probe_r4d import time_step
from scripts.perf_probe_r5b import sg


def main():
    print("backend:", jax.default_backend(), flush=True)
    ds, refine_ds, scale = bench.get_dataset()
    cache = jax.tree.map(jnp.asarray, bench.get_flow_cache(refine_ds, scale))
    frames = [jax.tree.map(jnp.asarray, ds.frame(i)) for i in range(len(ds))]

    from lidar4d_tpu.train.losses import LossConfig

    loss_cfg = LossConfig(flow_loss=True, grad_loss=True, scale=scale,
                          num_frames=bench.FRAMES, iters=30000)
    opt_cfg = (loss_cfg, scale)

    k, b = (int(v) for v in os.environ.get("PHASH", "1,11").split(","))
    cfg = LiDAR4DConfig(
        num_frames=bench.FRAMES, near_lidar=1.0 * scale,
        far_lidar=81.0 * scale,
        n_levels_hash=6, n_features_per_level_hash=8,
        log2_hashmap_size=11, base_resolution=64, max_resolution=2048,
        hash_size_dynamic=(11, 10, 10),
        flow_n_levels=4, flow_n_features=8, flow_log2_hashmap_size=11,
        flow_base_resolution=16, flow_max_resolution=256,
        plane_hash_scales=k, plane_hash_log2=b,
        remat_density=False, density_chunk=0,
    )
    field = LiDAR4DField(cfg)

    targets = [
        ("hash_static", HashGrid4D, "forward_static"),
        ("hash_dyn", HashGrid4D, "forward_dynamic_multi"),
        ("planes_static", Planes4D, "forward_static"),
        ("planes_dyn (+flow-net bwd it carries)", Planes4D,
         "forward_dynamic_scalar_t_multi"),
        ("flow_net", FlowField, "__call__"),
    ]
    orig = {(c, m): getattr(c, m) for _, c, m in targets}

    base = time_step(f"base ({k},{b}) 128+256", field, opt_cfg, frames, cache)
    for name, c, m in targets:
        setattr(c, m, sg(orig[(c, m)]))
        time_step(f"stop-grad {name}", field, opt_cfg, frames, cache)
        setattr(c, m, orig[(c, m)])

    for _, c, m in targets:
        setattr(c, m, sg(orig[(c, m)]))
    time_step("stop-grad ALL encodes (bwd-free, real fwd)", field, opt_cfg,
              frames, cache)
    for _, c, m in targets:
        setattr(c, m, orig[(c, m)])

    base2 = time_step("base again (drift check)", field, opt_cfg, frames,
                      cache)
    print(f"drift: {base:.1f} -> {base2:.1f} ms", flush=True)
    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
