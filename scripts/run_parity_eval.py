"""Standalone parity-architecture ep14 eval (round-4 chip job #1).

Produces the missing quality row for `workspace/ab3_parityarch` (VERDICT r3
#1): evaluate the ep14 checkpoint on the 10 held-out frames with
refine=False — matching the in-training eval settings the paired flagship
row (`bench_ab_flagship_ep14`) uses (neither arm runs a refine stage, and an
untrained U-Net must not touch the raydrop mask).

Renders go through render_staged_host (host chunk loop): the lax.map
composite over gather-path chunks faults the TPU worker (diagnosed by
scripts/probe_parity_eval.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_parity_eval.py
"""

import time

import jax


def main():
    print("backend:", jax.default_backend(), flush=True)

    from lidar4d_tpu.cli.config import (
        build_loss_config,
        build_model_config,
        get_arg_parser,
    )
    from lidar4d_tpu.data import KITTI360Dataset
    from lidar4d_tpu.eval.meters import (
        DepthMeter,
        IntensityMeter,
        PointsMeter,
        RaydropMeter,
    )
    from lidar4d_tpu.models.lidar4d import LiDAR4DField
    from lidar4d_tpu.train.trainer import Trainer

    parser = get_arg_parser()
    opt = parser.parse_args(
        ["--config", "configs/bench_ab_parityarch_ep14.txt", "--test_eval"]
    )
    opt.near_lidar = opt.near_lidar * opt.scale
    opt.far_lidar = opt.far_lidar * opt.scale

    field = LiDAR4DField(build_model_config(opt))
    lidar_metrics = [
        RaydropMeter(ratio=opt.raydrop_ratio),
        IntensityMeter(scale=opt.intensity_scale),
        DepthMeter(scale=opt.scale),
        PointsMeter(scale=opt.scale, intrinsics=opt.fov_lidar),
    ]
    trainer = Trainer(
        "lidar4d", opt, field, build_loss_config(opt),
        workspace=opt.workspace, lidar_metrics=lidar_metrics,
        use_checkpoint="latest", eval_interval=opt.eval_interval,
    )
    print(f"loaded epoch {trainer.epoch} step {trainer.global_step}",
          flush=True)

    ds = KITTI360Dataset(
        split="test", root_path=opt.path, sequence_id=opt.sequence_id,
        scale=opt.scale, offset=opt.offset, fov_lidar=opt.fov_lidar,
        num_rays_lidar=opt.num_rays_lidar,
        patch_size_lidar=opt.patch_size_lidar,
    )
    print(f"test split: {len(ds)} frames", flush=True)
    t0 = time.perf_counter()
    # refine=False: matched-pair settings (see module docstring)
    trainer.evaluate(ds, refine=False)
    print(f"eval wall time: {time.perf_counter() - t0:.1f}s", flush=True)
    print("PARITY EVAL DONE", flush=True)


if __name__ == "__main__":
    main()
