"""Staged diagnosis of the parity-architecture eval TPU-worker crash (r3).

The r3 run `workspace/ab3_parityarch` trained to ep14 but crashed the TPU
worker (`UNAVAILABLE: TPU worker process crashed or restarted`) at the FIRST
eval frame — the first-ever full-frame (66x1030 rays, 768 uniform samples)
render on the 2^19-row gather path. VERDICT r3 #1: probe ONE chunk first.

Stages (each prints before/after so the log shows where a crash lands):
  1. 1024-ray forward render (render_rays, uniform 768)   — tiny
  2. 4096-ray forward render (the eval chunk size)         — the suspect
  3. full-frame render_staged (17 chunks via lax.map)      — the real eval
Each stage syncs via float() (block_until_ready lies on axon) and reports
wall time.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_parity_eval.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("backend:", jax.default_backend(), flush=True)

    from lidar4d_tpu.cli.config import (
        build_loss_config,
        build_model_config,
        get_arg_parser,
    )
    from lidar4d_tpu.data import KITTI360Dataset
    from lidar4d_tpu.models.lidar4d import LiDAR4DField
    from lidar4d_tpu.models.renderer import render_rays, render_staged
    from lidar4d_tpu.ops.rays import get_lidar_rays
    from lidar4d_tpu.train.trainer import Trainer

    parser = get_arg_parser()
    opt = parser.parse_args(
        ["--config", "configs/bench_ab_parityarch_ep14.txt", "--test_eval"]
    )
    opt.near_lidar = opt.near_lidar * opt.scale
    opt.far_lidar = opt.far_lidar * opt.scale
    opt.workspace = "workspace/ab3_parityarch"

    field = LiDAR4DField(build_model_config(opt))
    loss_cfg = build_loss_config(opt)
    trainer = Trainer(
        "lidar4d", opt, field, loss_cfg, workspace=opt.workspace,
        lidar_metrics=[], use_checkpoint="latest", eval_interval=opt.eval_interval,
    )
    print(f"loaded epoch {trainer.epoch} step {trainer.global_step}", flush=True)
    params = trainer._eval_params()
    bad = [
        k for k, l in enumerate(jax.tree.leaves(params))
        if not np.isfinite(np.asarray(l)).all()
    ]
    print("nonfinite param leaves:", bad, flush=True)

    ds = KITTI360Dataset(
        split="test", root_path=opt.path, sequence_id=opt.sequence_id,
        scale=opt.scale, offset=opt.offset, fov_lidar=opt.fov_lidar,
        num_rays_lidar=opt.num_rays_lidar, patch_size_lidar=opt.patch_size_lidar,
    )
    H, W = ds.H_lidar, ds.W_lidar
    frame = ds.frame(0)
    rays = get_lidar_rays(
        jnp.asarray(frame["pose"]), ds.intrinsics_lidar, H, W, N=-1
    )
    t = jnp.float32(frame["time"])
    ro, rd = rays["rays_o"], rays["rays_d"]
    print(f"frame 0: {ro.shape[0]} rays, t={float(t):.4f}", flush=True)

    fwd = jax.jit(
        lambda o, d: render_rays(
            field, params, o, d, t, num_steps=opt.num_steps, perturb=False,
            with_aux=False,
        ),
        static_argnames=(),
    )

    for n in (1024, 4096):
        print(f"--- stage: {n}-ray forward render (uniform {opt.num_steps})",
              flush=True)
        t0 = time.perf_counter()
        out = fwd(ro[:n], rd[:n])
        s = float(jnp.sum(out["depth_lidar"]))
        dt = time.perf_counter() - t0
        print(f"    OK: sum(depth)={s:.4f}  ({dt:.1f}s incl compile)", flush=True)
        t0 = time.perf_counter()
        out = fwd(ro[:n], rd[:n])
        s = float(jnp.sum(out["depth_lidar"]))
        print(f"    warm: {time.perf_counter() - t0:.2f}s", flush=True)

    print("--- stage: full-frame render_staged (chunk 4096)", flush=True)
    t0 = time.perf_counter()
    out = render_staged(
        field, params, ro, rd, t, num_steps=opt.num_steps, chunk=4096,
    )
    s = float(jnp.sum(out["depth_lidar"]))
    dt = time.perf_counter() - t0
    print(f"    OK: sum(depth)={s:.4f}  ({dt:.1f}s incl compile)", flush=True)
    t0 = time.perf_counter()
    out = render_staged(
        field, params, ro, rd, t, num_steps=opt.num_steps, chunk=4096,
    )
    s = float(jnp.sum(out["depth_lidar"]))
    print(f"    warm frame: {time.perf_counter() - t0:.1f}s", flush=True)
    print("ALL STAGES PASSED", flush=True)


if __name__ == "__main__":
    main()
