"""Round-4 probe, part D — IN-STEP ablation attribution of the flagship
train step (1024 rays x 128+256, full losses, the exact bench.py setup).

Micro-benchmarks of individual encodes are polluted by a large per-sync
tunnel constant and miss XLA cross-op fusion (PERF.md r3/r4 notes); this
probe instead times the REAL jitted train step with one component at a time
replaced by a cheap same-shape stub (a traced mean-broadcast, NOT zeros —
XLA constant-folds zero operands through the downstream matmuls, which
would over-attribute). All configs run in one process; deltas vs base share
the same sync overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r4d.py
"""

import time

import jax
import jax.numpy as jnp

import bench
from lidar4d_tpu.models.hash_field import HashGrid4D
from lidar4d_tpu.models.planes_field import Planes4D
from lidar4d_tpu.models.flow_field import FlowField
from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField


def time_step(name, field, opt_cfg, frames, cache, num_coarse=128,
              num_fine=256, num_steps=768, iters=7):
    from lidar4d_tpu.train.losses import LossConfig
    from lidar4d_tpu.train.train_step import init_train_state, make_train_step

    loss_cfg, scale = opt_cfg
    state, opt = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2,
                                  iters=30000)
    step = make_train_step(
        field, opt, loss_cfg, H=bench.H, W=bench.W, fov_lidar=(2.0, 26.9),
        num_rays=1024, num_steps=num_steps, patch_size=1,
        num_coarse=num_coarse, num_fine=num_fine,
    )
    key = jax.random.PRNGKey(1)
    for i in range(2):
        key, k = jax.random.split(key)
        state, metrics = step(state, frames[i % len(frames)], cache, k)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        key, k = jax.random.split(key)
        state, metrics = step(state, frames[i % len(frames)], cache, k)
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.1f} ms/step ({1024 * 1000 / dt:.0f} rays/s)",
          flush=True)
    return dt


def stub_like(x, shape):
    # cheap, non-constant-foldable stand-in: one reduce + broadcast
    return jnp.broadcast_to(jnp.mean(x) * 1e-3, shape)


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
    field = LiDAR4DField(cfg)

    # originals
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

    def stub_attr(self, params, d, geo_feat):
        return stub_like(geo_feat, (geo_feat.shape[0], 2))

    base = time_step("base 128+256", field, opt_cfg, frames, cache)

    HashGrid4D.forward_dynamic_multi = stub_hash_dyn
    time_step("no hash_dyn", field, opt_cfg, frames, cache)
    restore()

    HashGrid4D.forward_static = stub_hash_static
    time_step("no hash_static", field, opt_cfg, frames, cache)
    restore()

    Planes4D.forward_static = stub_planes_static
    time_step("no planes_static", field, opt_cfg, frames, cache)
    restore()

    Planes4D.forward_dynamic_scalar_t_multi = stub_planes_dyn
    time_step("no planes_dyn", field, opt_cfg, frames, cache)
    restore()

    FlowField.__call__ = stub_flow
    time_step("no flow_net", field, opt_cfg, frames, cache)
    restore()

    LiDAR4DField.attribute = stub_attr
    time_step("no attr heads", field, opt_cfg, frames, cache)
    restore()

    HashGrid4D.forward_static = stub_hash_static
    HashGrid4D.forward_dynamic_multi = stub_hash_dyn
    Planes4D.forward_static = stub_planes_static
    Planes4D.forward_dynamic_scalar_t_multi = stub_planes_dyn
    FlowField.__call__ = stub_flow
    time_step("no encodes at all", field, opt_cfg, frames, cache)
    restore()

    # sampling machinery tax: uniform 384 = same sample count, no
    # sample_pdf/merge/second density dispatch
    time_step("uniform 384 (no hier)", field, opt_cfg, frames, cache,
              num_coarse=0, num_fine=0, num_steps=384)

    # loss tail
    loss_cfg2 = LossConfig(flow_loss=False, grad_loss=True, scale=scale,
                           num_frames=bench.FRAMES, iters=30000)
    time_step("no flow loss", field, (loss_cfg2, scale), frames, cache)

    base2 = time_step("base again (drift check)", field, opt_cfg, frames,
                      cache)
    print(f"drift: {base:.1f} -> {base2:.1f} ms", flush=True)
    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
