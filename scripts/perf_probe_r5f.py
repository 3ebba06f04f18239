"""Round-5 probe, part F — A/B + exactness gate for coord_grad_lead.

The planes-dynamic backward computed a coordinate gradient for ALL V*3
planes per scale; variant 0's dx dies at the ray geometry (lidar4d.density
feeds unwarped sample positions), but XLA cannot DCE work inside the opaque
pallas VJP. `plane_linear(..., coord_grad_lead)` now skips that half of the
backward kernel for the leading planes (ops/plane_onehot.py), and
lidar4d.density passes coord_grad_lead=1.

This probe (a) times the shipped step (lead=1) against the old behavior
(lead=0, via a wrapper restoring the previous call), and (b) asserts the
param GRADIENTS of the two are identical on the real chip — the skip must
be pure dead-code removal. Run:

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_probe_r5f.py
"""

import numpy as np

import jax
import jax.numpy as jnp

import bench
from lidar4d_tpu.models.planes_field import Planes4D
from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
from scripts.perf_probe_r4d import time_step


def main():
    from lidar4d_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
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
        plane_hash_scales=1, plane_hash_log2=11,
        remat_density=False, density_chunk=0,
    )
    field = LiDAR4DField(cfg)

    orig = Planes4D.forward_dynamic_scalar_t_multi

    def no_lead(self, params, xyzs, ts, coord_grad_lead=0):
        return orig(self, params, xyzs, ts, coord_grad_lead=0)

    # -- exactness gate: param grads must match between lead=0 and lead=1 --
    from lidar4d_tpu.train.train_step import init_train_state, make_train_step

    def one_grad():
        state, opt = init_train_state(field, jax.random.PRNGKey(0), lr=1e-2,
                                      iters=30000)
        step = make_train_step(
            field, opt, loss_cfg, H=bench.H, W=bench.W, fov_lidar=(2.0, 26.9),
            num_rays=1024, num_steps=768, patch_size=1,
            num_coarse=128, num_fine=256,
        )
        state2, metrics = step(state, frames[0], cache, jax.random.PRNGKey(1))
        return jax.tree.map(np.asarray, state2.params), float(metrics["loss"])

    p_new, loss_new = one_grad()
    Planes4D.forward_dynamic_scalar_t_multi = no_lead
    p_old, loss_old = one_grad()
    Planes4D.forward_dynamic_scalar_t_multi = orig

    worst = 0.0
    for a, b in zip(jax.tree.leaves(p_new), jax.tree.leaves(p_old)):
        d = float(np.max(np.abs(a - b)))
        s = max(float(np.max(np.abs(b))), 1e-8)
        worst = max(worst, d / s)
    print(f"loss lead1={loss_new:.6f} lead0={loss_old:.6f} "
          f"post-step param worst rel diff: {worst:.3e}", flush=True)
    assert worst < 1e-5, "coord_grad_lead changed live gradients!"
    print("EXACTNESS GATE PASSED", flush=True)

    # -- timing: the lead=0 baseline at this config is r5e's base row (the
    # r5e probe ran pre-change code); only the new path needs a row here --
    time_step("lead=1 (shipped)", field, opt_cfg, frames, cache)
    print("PROBES DONE", flush=True)


if __name__ == "__main__":
    main()
