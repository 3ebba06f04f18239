"""Round-5 probe, part B — forward/backward split of each encode family.

The r4d in-step ablation gives each component's TOTAL marginal cost
(fwd+bwd). This probe separates the halves by re-running the ablation with
the component's forward kept but its output stop_gradient'ed: the step
then pays the real forward while XLA drops the component's backward
(table grads AND any upstream grads riding it — e.g. stop-gradding
planes_dyn also drops the flow-net backward that flows through the warped
coordinates; interpret those rows jointly with r4d).

  fwd(component)  ~= step(stop_grad) - step(stubbed)     [r4d stubs]
  bwd(component)  ~= step(base) - step(stop_grad)

Why it matters: the r4 gather-form kernels accelerated FORWARDS only; the
backwards still ride the one-hot MXU contraction at F'. If bwd dominates a
family's marginal, r5's lever is a gather/scatter-form backward (or fewer
trainable scales), not more forward work.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r5b.py
"""

import jax

import jax.numpy as jnp

import bench
from lidar4d_tpu.models.hash_field import HashGrid4D
from lidar4d_tpu.models.planes_field import Planes4D
from lidar4d_tpu.models.flow_field import FlowField
from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
from scripts.perf_probe_r4d import time_step


def sg(fn):
    def wrapped(self, *a, **k):
        return jax.lax.stop_gradient(fn(self, *a, **k))
    return wrapped


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

    targets = [
        ("hash_static", HashGrid4D, "forward_static"),
        ("hash_dyn", HashGrid4D, "forward_dynamic_multi"),
        ("planes_static", Planes4D, "forward_static"),
        ("planes_dyn (+flow-net bwd it carries)", Planes4D,
         "forward_dynamic_scalar_t_multi"),
        ("flow_net", FlowField, "__call__"),
    ]
    orig = {(c, m): getattr(c, m) for _, c, m in targets}

    base = time_step("base 128+256", field, opt_cfg, frames, cache)
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
