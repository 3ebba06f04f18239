"""Eval-render sampling A/B (VERDICT r3 #5: cut eval render to <=100 s).

Renders the ab4 flagship ep14 checkpoint's 10 held-out frames twice —
at the training sample split (128+256) and at the fast split (64+128) —
and reports meters + render wall time for both. If the metrics match within
run noise, inference-time sampling can drop to the fast split: the render
cost is linear in samples, so 64+128 is ~2.1x fewer field queries.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/eval_sampling_ab.py
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
        ["--config", "configs/bench_ab_flagship_ep14.txt", "--test_eval",
         "--workspace", "workspace/ab4_flagship_ep14"]
    )
    opt.near_lidar = opt.near_lidar * opt.scale
    opt.far_lidar = opt.far_lidar * opt.scale

    field = LiDAR4DField(build_model_config(opt))
    ds = KITTI360Dataset(
        split="test", root_path=opt.path, sequence_id=opt.sequence_id,
        scale=opt.scale, offset=opt.offset, fov_lidar=opt.fov_lidar,
        num_rays_lidar=opt.num_rays_lidar,
        patch_size_lidar=opt.patch_size_lidar,
    )

    for tag, (nc, nf) in (("train-split 128+256", (128, 256)),
                          ("fast-split 64+128", (64, 128))):
        opt.num_coarse, opt.num_fine = nc, nf
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
        print(f"=== {tag}: epoch {trainer.epoch} ===", flush=True)
        t0 = time.perf_counter()
        trainer.evaluate(ds, name=f"evalab_{nc}_{nf}", refine=False)
        print(f"{tag}: wall {time.perf_counter() - t0:.1f}s", flush=True)

    print("EVAL SAMPLING AB DONE", flush=True)


if __name__ == "__main__":
    main()
