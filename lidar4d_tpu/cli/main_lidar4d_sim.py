"""Simulation CLI: novel space-time LiDAR sweeps from a trained checkpoint.

Equivalent of the reference's `main_lidar4d_sim.py`: loads a checkpoint,
builds full-frame rays for an arbitrary sensor config (fov / H / W) along the
(optionally shifted / motion-aligned) trajectory, and renders point clouds,
panels and a video. Includes the `--kitti2nus` preset
(main_lidar4d_sim.py:184-190).

Run:  python -m lidar4d_tpu.cli.main_lidar4d_sim --config configs/kitti360_4950.txt \
          --ckpt <path> --shift_y 0.5 --align_axis
"""

import numpy as np

from lidar4d_tpu.cli.config import ConfigArgumentParser, build_model_config
from lidar4d_tpu.data.kitti360 import SEQUENCE_RANGES, KITTI360Dataset
from lidar4d_tpu.models.lidar4d import LiDAR4DField
from lidar4d_tpu.sim.simulator import Simulator, build_novel_rays, shift_trajectory
from lidar4d_tpu.train.checkpoints import CheckpointManager
from lidar4d_tpu.train.train_step import init_train_state
from lidar4d_tpu.utils.misc import set_seed

import jax


def get_sim_arg_parser():
    p = ConfigArgumentParser()
    p.add_argument("--config", type=str, default="configs/kitti360_4950.txt")
    p.add_argument("--workspace", type=str, default="simulation")
    p.add_argument("--ckpt", type=str, default="latest_model")
    p.add_argument("--seed", type=int, default=0)
    # dataset (keep the same as training)
    p.add_argument("--dataloader", type=str, default="kitti360")
    p.add_argument("--path", type=str, default="data/kitti360")
    p.add_argument("--sequence_id", type=str, default="4950")
    p.add_argument("--preload", type=bool, default=True)
    p.add_argument("--bound", type=float, default=1)
    p.add_argument("--scale", type=float, default=0.01)
    p.add_argument("--offset", type=float, nargs="*", default=[0, 0, 0])
    p.add_argument("--near_lidar", type=float, default=1.0)
    p.add_argument("--far_lidar", type=float, default=81.0)
    p.add_argument("--num_frames", type=int, default=51)
    p.add_argument("--active_sensor", action="store_true")
    p.add_argument("--density_scale", type=float, default=1)
    p.add_argument("--fp16", type=bool, default=True)
    p.add_argument("--num_steps", type=int, default=768)
    # model (keep the same as training)
    p.add_argument("--min_resolution", type=int, default=32)
    p.add_argument("--base_resolution", type=int, default=512)
    p.add_argument("--max_resolution", type=int, default=32768)
    p.add_argument("--time_resolution", type=int, default=8)
    p.add_argument("--n_levels_plane", type=int, default=4)
    p.add_argument("--n_features_per_level_plane", type=int, default=8)
    p.add_argument("--n_levels_hash", type=int, default=8)
    p.add_argument("--n_features_per_level_hash", type=int, default=4)
    p.add_argument("--log2_hashmap_size", type=int, default=19)
    p.add_argument("--hash_size_dynamic", type=int, nargs=3, default=[15, 13, 13])
    p.add_argument("--flow_n_levels", type=int, default=8)
    p.add_argument("--flow_n_features", type=int, default=8)
    p.add_argument("--flow_log2_hashmap_size", type=int, default=18)
    p.add_argument("--flow_base_resolution", type=int, default=32)
    p.add_argument("--flow_max_resolution", type=int, default=8192)
    p.add_argument("--num_coarse", type=int, default=0)
    p.add_argument("--num_fine", type=int, default=0)
    p.add_argument("--num_layers_flow", type=int, default=3)
    p.add_argument("--hidden_dim_flow", type=int, default=64)
    p.add_argument("--num_layers_sigma", type=int, default=2)
    p.add_argument("--hidden_dim_sigma", type=int, default=64)
    p.add_argument("--geo_feat_dim", type=int, default=15)
    p.add_argument("--num_layers_lidar", type=int, default=3)
    p.add_argument("--hidden_dim_lidar", type=int, default=64)
    p.add_argument("--out_lidar_dim", type=int, default=2)
    p.add_argument("--use_refine", type=bool, default=True)
    # simulation
    p.add_argument("--fov_lidar", type=float, nargs="*", default=[2.0, 26.9])
    p.add_argument("--H_lidar", type=int, default=66)
    p.add_argument("--W_lidar", type=int, default=1030)
    p.add_argument("--shift_x", type=float, default=0.0)
    p.add_argument("--shift_y", type=float, default=0.0)
    p.add_argument("--shift_z", type=float, default=0.0)
    p.add_argument("--align_axis", action="store_true")
    p.add_argument("--kitti2nus", action="store_true")
    return p


def apply_kitti2nus_preset(opt):
    """KITTI-360 -> nuScenes sensor preset (main_lidar4d_sim.py:184-190):
    fov [10, 40], 32x1024 grid, far 70 m, sensor lifted 0.1 m, no U-Net
    refine (the refiner was trained on the 66x1030 KITTI grid)."""
    opt.fov_lidar = [10.0, 40.0]
    opt.H_lidar = 32
    opt.W_lidar = 1024
    opt.far_lidar = 70
    opt.shift_z += 0.1 * opt.scale
    opt.use_refine = False
    return opt


def _sequence_poses_times(opt):
    """Per-frame lidar2world + times for the sequence.

    The reference re-derives poses from raw KITTI-360 (main_lidar4d_sim.py:
    118-172); without raw data we take them from the preprocessed transforms
    JSONs (identical values — they were derived by the same loader).
    """
    frames = {}
    for split in ("train", "val"):
        try:
            ds = KITTI360Dataset(
                split=split, root_path=opt.path, sequence_id=opt.sequence_id,
                scale=opt.scale, offset=opt.offset, fov_lidar=opt.fov_lidar,
            )
        except FileNotFoundError:
            continue
        for i in range(len(ds)):
            frames[int(ds.frame_ids[i])] = (
                np.asarray(ds.poses_lidar[i]), float(ds.times[i])
            )
    if not frames:
        raise FileNotFoundError("no transforms JSONs found for simulation")
    fids = sorted(frames)
    poses = np.stack([frames[f][0] for f in fids])
    times = np.asarray([frames[f][1] for f in fids], np.float32)
    return poses, times


def main(argv=None):
    from lidar4d_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = get_sim_arg_parser()
    opt = parser.parse_args(argv)
    set_seed(opt.seed)

    if opt.kitti2nus:
        apply_kitti2nus_preset(opt)

    opt.near_lidar = opt.near_lidar * opt.scale
    opt.far_lidar = opt.far_lidar * opt.scale

    field = LiDAR4DField(build_model_config(opt))

    # load model weights
    state, _ = init_train_state(field, jax.random.PRNGKey(0))
    import os

    if os.path.isdir(opt.ckpt):
        ckpt_dir = os.path.dirname(os.path.abspath(opt.ckpt))
        mgr = CheckpointManager(os.path.dirname(ckpt_dir), name="lidar4d")
        path = opt.ckpt
    else:
        mgr = CheckpointManager(opt.workspace, name="lidar4d")
        path = mgr.resolve(opt.ckpt, include_refine=True)
    if path is None:
        print("[WARN] No checkpoint found, model randomly initialized.")
        params = state.params
    else:
        print(f"[INFO] Loading {path} ...")
        if str(path).endswith("_refine"):
            tree = mgr.restore(path, {"params": state.params, "epoch": 0})
        else:
            tree = mgr.restore(
                path, {"params": state.params, "epoch": 0, "global_step": 0}
            )
        params = tree["params"]

    sim = Simulator(
        "lidar4d", opt, field, params,
        workspace=opt.workspace, use_refine=opt.use_refine,
        H_lidar=opt.H_lidar, W_lidar=opt.W_lidar,
    )

    poses, times = _sequence_poses_times(opt)
    rays_o, rays_d = build_novel_rays(poses, opt.H_lidar, opt.W_lidar, opt.fov_lidar)
    rays_o = shift_trajectory(
        rays_o, opt.shift_x, opt.shift_y, opt.shift_z, opt.scale,
        align_axis=opt.align_axis,
    )
    sim.render(rays_o, rays_d, times)


if __name__ == "__main__":
    main()
