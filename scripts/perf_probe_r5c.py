"""Round-5 probe, part C — in-step ablation attribution ON the winning
plane_hash_scales config (default (1,12), the converged-gate winner:
91.7 ms probe / 11.5k rays/s in-run vs 101.5-102.8 dense; override with
PHASH=k,b). Re-runs the r4d component ablation with the hashed static
plane scale(s) in place so the NEXT lever is chosen from fresh
attribution, not the stale dense-planes table.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r5c.py
"""

import dataclasses

import jax
import jax.numpy as jnp

import bench
from lidar4d_tpu.models.hash_field import HashGrid4D
from lidar4d_tpu.models.planes_field import Planes4D
from lidar4d_tpu.models.flow_field import FlowField
from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
from scripts.perf_probe_r4d import (
    time_step, stub_like,
)


def main():
    print("backend:", jax.default_backend(), flush=True)
    ds, refine_ds, scale = bench.get_dataset()
    cache = jax.tree.map(jnp.asarray, bench.get_flow_cache(refine_ds, scale))
    frames = [jax.tree.map(jnp.asarray, ds.frame(i)) for i in range(len(ds))]

    from lidar4d_tpu.train.losses import LossConfig

    loss_cfg = LossConfig(flow_loss=True, grad_loss=True, scale=scale,
                          num_frames=bench.FRAMES, iters=30000)
    opt_cfg = (loss_cfg, scale)

    import os

    k, b = (int(v) for v in os.environ.get("PHASH", "1,12").split(","))
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
    phash_label = f"({k},{b})"

    orig = {
        "hash_static": HashGrid4D.forward_static,
        "hash_dyn": HashGrid4D.forward_dynamic_multi,
        "planes_static": Planes4D.forward_static,
        "planes_dyn": Planes4D.forward_dynamic_scalar_t_multi,
        "flow": FlowField.__call__,
        "attr": LiDAR4DField.attribute,
    }

    def restore():
        HashGrid4D.forward_static = orig["hash_static"]
        HashGrid4D.forward_dynamic_multi = orig["hash_dyn"]
        Planes4D.forward_static = orig["planes_static"]
        Planes4D.forward_dynamic_scalar_t_multi = orig["planes_dyn"]
        FlowField.__call__ = orig["flow"]
        LiDAR4DField.attribute = orig["attr"]

    def stub_hash_static(self, params, x):
        return stub_like(x, (x.shape[0], self.n_output_dims_static))

    def stub_hash_dyn(self, params, xs, ts, fused=None):
        return stub_like(xs, (xs.shape[0], xs.shape[1],
                              self.n_output_dims_dynamic))

    def stub_planes_static(self, params, pts):
        return stub_like(
            pts, (pts.shape[0], self.output_dim * len(self.multiscale_res)))

    def stub_planes_dyn(self, params, xyzs, ts):
        return stub_like(
            xyzs, (xyzs.shape[0], xyzs.shape[1],
                   self.output_dim * len(self.multiscale_res)))

    def stub_flow(self, params, x, t):
        return stub_like(x, (x.shape[0], 6))

    base = time_step(f"base {phash_label} 128+256", field, opt_cfg, frames,
                     cache)

    Planes4D.forward_static = stub_planes_static
    time_step("no planes_static", field, opt_cfg, frames, cache)
    restore()

    HashGrid4D.forward_dynamic_multi = stub_hash_dyn
    time_step("no hash_dyn", field, opt_cfg, frames, cache)
    restore()

    Planes4D.forward_dynamic_scalar_t_multi = stub_planes_dyn
    time_step("no planes_dyn", field, opt_cfg, frames, cache)
    restore()

    HashGrid4D.forward_static = stub_hash_static
    time_step("no hash_static", field, opt_cfg, frames, cache)
    restore()

    FlowField.__call__ = stub_flow
    time_step("no flow_net", field, opt_cfg, frames, cache)
    restore()

    HashGrid4D.forward_static = stub_hash_static
    HashGrid4D.forward_dynamic_multi = stub_hash_dyn
    Planes4D.forward_static = stub_planes_static
    Planes4D.forward_dynamic_scalar_t_multi = stub_planes_dyn
    FlowField.__call__ = stub_flow
    time_step("no encodes at all (floor)", field, opt_cfg, frames, cache)
    restore()

    loss_cfg2 = LossConfig(flow_loss=False, grad_loss=True, scale=scale,
                           num_frames=bench.FRAMES, iters=30000)
    time_step("no flow loss", field, (loss_cfg2, scale), frames, cache)

    base2 = time_step("base again (drift check)", field, opt_cfg, frames,
                      cache)
    print(f"drift: {base:.1f} -> {base2:.1f} ms", flush=True)
    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
