"""Training / evaluation / refinement CLI.

Drop-in equivalent of the reference's `main_lidar4d.py`: same flags, same
config txt files, same workspace layout (args dump, checkpoints, validation
panels, test outputs). Dispatches train / --test / --test_eval / --refine.

Run:  python -m lidar4d_tpu.cli.main_lidar4d --config configs/kitti360_4950.txt
"""

import os

import numpy as np

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
from lidar4d_tpu.utils.misc import set_seed


def main(argv=None):
    from lidar4d_tpu.parallel.mesh import init_distributed
    from lidar4d_tpu.utils.compile_cache import enable_compilation_cache

    # multi-host (pod) entry: a no-op unless LIDAR4D_COORDINATOR /
    # LIDAR4D_NUM_PROCS env vars (or a real TPU pod slice) are present.
    # Must run before the first jax device query.
    distributed = init_distributed()

    enable_compilation_cache()
    parser = get_arg_parser()
    opt = parser.parse_args(argv)
    set_seed(opt.seed)
    if distributed:
        import jax

        print(f"[INFO] distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.device_count()} devices "
              f"({jax.local_device_count()} local), mesh={opt.mesh}")

    # args dump (main_lidar4d.py:140-145)
    os.makedirs(opt.workspace, exist_ok=True)
    with open(os.path.join(opt.workspace, "args.txt"), "w") as f:
        for arg in vars(opt):
            f.write(f"{arg} = {getattr(opt, arg)}\n")

    # near/far scaled into the unit box (main_lidar4d.py:152-153)
    opt.near_lidar = opt.near_lidar * opt.scale
    opt.far_lidar = opt.far_lidar * opt.scale

    # the reference's nuScenes branch is unimplemented there too
    # (main_lidar4d.py:127-134 comments it out); fail fast with a clear error
    # instead of a FileNotFoundError from the KITTI-360 loader
    if opt.dataloader == "nuscenes":
        raise SystemExit(
            "--dataloader nuscenes is not implemented (the reference ships "
            "KITTI-360 only; see /root/reference/main_lidar4d.py:134). Use "
            "kitti360 or synthetic."
        )

    # synthetic sequences regenerate on demand (deterministic given the seed,
    # so the config's scale/offset stay valid)
    if opt.dataloader == "synthetic":
        tf = os.path.join(opt.path, f"transforms_{opt.sequence_id}_train.json")
        if not os.path.exists(tf):
            from lidar4d_tpu.data.synthetic import generate_synthetic_sequence

            scale, offset = generate_synthetic_sequence(
                opt.path, sequence_id=opt.sequence_id,
                num_frames=opt.num_frames, H=opt.synthetic_H,
                W=opt.synthetic_W, fov_lidar=tuple(opt.fov_lidar),
                seed=opt.synthetic_seed,
            )
            if abs(scale - opt.scale) > 1e-6 * max(abs(scale), 1e-9):
                print(f"[WARN] generated scale {scale} != config scale "
                      f"{opt.scale}; config values win")

    field = LiDAR4DField(build_model_config(opt))
    loss_cfg = build_loss_config(opt)

    def make_ds(split):
        return KITTI360Dataset(
            split=split,
            root_path=opt.path,
            sequence_id=opt.sequence_id,
            scale=opt.scale,
            offset=opt.offset,
            fov_lidar=opt.fov_lidar,
            num_rays_lidar=opt.num_rays_lidar,
            patch_size_lidar=opt.patch_size_lidar,
        )

    lidar_metrics = [
        RaydropMeter(ratio=opt.raydrop_ratio),
        IntensityMeter(scale=opt.intensity_scale),
        DepthMeter(scale=opt.scale),
        PointsMeter(scale=opt.scale, intrinsics=opt.fov_lidar),
    ]

    trainer = Trainer(
        "lidar4d",
        opt,
        field,
        loss_cfg,
        workspace=opt.workspace,
        lidar_metrics=lidar_metrics,
        use_checkpoint=opt.ckpt,
        ema_decay=opt.ema_decay,
        eval_interval=opt.eval_interval,
        seed=opt.seed,
    )

    if opt.test or opt.test_eval or opt.refine:
        if opt.refine:
            trainer.refine(make_ds("refine"))
        test_ds = make_ds("test")
        if not opt.test:
            trainer.evaluate(test_ds)
        trainer.test(test_ds)
        return

    train_ds = make_ds("train")
    valid_ds = make_ds("val")
    refine_ds = make_ds("refine")

    max_epoch = int(np.ceil(opt.iters / len(train_ds)))
    if getattr(opt, "max_epochs", 0):
        max_epoch = min(max_epoch, opt.max_epochs)
    print(f"max_epoch: {max_epoch}")
    trainer.train(train_ds, valid_ds, refine_ds, max_epoch,
                  run_refine=not opt.train_only)

    if opt.train_only:
        return

    test_ds = make_ds("test")
    trainer.evaluate(test_ds)
    trainer.test(test_ds)


if __name__ == "__main__":
    main()
