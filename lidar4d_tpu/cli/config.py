"""CLI/config surface — same flags and txt-config format as the reference.

The reference uses configargparse (`main_lidar4d.py:20-104`): a txt config
file (`key = value` lines) supplies defaults, CLI flags override. That
package isn't available here, so this module implements the same contract on
top of argparse: `--config path` loads the txt file, values typed via the
argparse registry, CLI wins. Flag names, defaults and semantics match
main_lidar4d.py:20-104 one-to-one (plus a few framework-native extras,
clearly marked).
"""

import argparse
import ast
import os


def _parse_config_txt(path):
    """Parse the reference's config txt format (configargparse subset)."""
    values = {}
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            key, val = line.split("=", 1)
            values[key.strip()] = val.strip()
    return values


def _coerce(action, raw):
    """Coerce a raw config-file string to the argparse action's type."""
    if isinstance(action.const, bool) or isinstance(action.default, bool):
        if raw.lower() in ("true", "1", "yes"):
            return True
        if raw.lower() in ("false", "0", "no"):
            return False
    if raw.startswith("["):
        vals = ast.literal_eval(raw)
        if action.type:
            vals = [action.type(v) for v in vals]
        return vals
    if action.nargs in ("*", "+"):
        vals = raw.split()
        if action.type:
            vals = [action.type(v) for v in vals]
        return vals
    if action.type:
        return action.type(raw)
    return raw


class ConfigArgumentParser(argparse.ArgumentParser):
    """argparse + `--config file.txt` defaults, reference-compatible."""

    def parse_args(self, args=None, namespace=None):  # noqa: D102
        ns, _ = super().parse_known_args(args)
        config_path = getattr(ns, "config", None)
        if config_path and os.path.exists(config_path):
            file_values = _parse_config_txt(config_path)
            defaults = {}
            for action in self._actions:
                if action.dest in file_values:
                    defaults[action.dest] = _coerce(action, file_values[action.dest])
            self.set_defaults(**defaults)
        return super().parse_args(args, namespace)


def get_arg_parser(default_config="configs/kitti360_4950.txt"):
    """Training CLI — flag-for-flag with main_lidar4d.py:20-104."""
    p = ConfigArgumentParser()
    p.add_argument("--config", type=str, default=default_config)
    p.add_argument("--workspace", type=str, default="workspace")
    p.add_argument("--refine", action="store_true")
    p.add_argument("--test", action="store_true")
    p.add_argument("--test_eval", action="store_true")
    # framework extension (no reference analogue): stop after the training
    # loop — skip the post-train evaluate/test/refine tail. Used by bounded
    # A/B runs whose signal is the in-train eval_interval metrics.
    p.add_argument("--train_only", action="store_true")
    p.add_argument("--seed", type=int, default=0)

    # dataset
    p.add_argument("--dataloader", type=str,
                   choices=("kitti360", "nuscenes", "synthetic"), default="kitti360")
    p.add_argument("--path", type=str, default="data/kitti360")
    p.add_argument("--sequence_id", type=str, default="4950")
    p.add_argument("--preload", type=bool, default=True)
    p.add_argument("--bound", type=float, default=1)
    p.add_argument("--scale", type=float, default=0.01)
    p.add_argument("--offset", type=float, nargs="*", default=[0, 0, 0])
    p.add_argument("--near_lidar", type=float, default=1.0)
    p.add_argument("--far_lidar", type=float, default=81.0)
    p.add_argument("--fov_lidar", type=float, nargs="*", default=[2.0, 26.9])
    p.add_argument("--num_frames", type=int, default=51)

    # LiDAR4D model
    p.add_argument("--min_resolution", type=int, default=32)
    p.add_argument("--base_resolution", type=int, default=512)
    p.add_argument("--max_resolution", type=int, default=32768)
    p.add_argument("--time_resolution", type=int, default=8)
    p.add_argument("--n_levels_plane", type=int, default=4)
    p.add_argument("--n_features_per_level_plane", type=int, default=8)
    # TPU extension: hash-compress the static planes of the top k scales
    # (models/planes_field.py Planes4D.hash_scales; 0 = reference-dense)
    p.add_argument("--plane_hash_scales", type=int, default=0)
    p.add_argument("--plane_hash_log2", type=int, default=11)
    p.add_argument("--n_levels_hash", type=int, default=8)
    p.add_argument("--n_features_per_level_hash", type=int, default=4)
    p.add_argument("--log2_hashmap_size", type=int, default=19)
    p.add_argument("--hash_size_dynamic", type=int, nargs=3, default=[15, 13, 13])
    p.add_argument("--num_layers_flow", type=int, default=3)
    p.add_argument("--hidden_dim_flow", type=int, default=64)
    p.add_argument("--num_layers_sigma", type=int, default=2)
    p.add_argument("--hidden_dim_sigma", type=int, default=64)
    p.add_argument("--geo_feat_dim", type=int, default=15)
    p.add_argument("--num_layers_lidar", type=int, default=3)
    p.add_argument("--hidden_dim_lidar", type=int, default=64)
    p.add_argument("--out_lidar_dim", type=int, default=2)

    # training
    p.add_argument("--depth_loss", type=str, default="l1")
    p.add_argument("--depth_grad_loss", type=str, default="l1")
    p.add_argument("--intensity_loss", type=str, default="mse")
    p.add_argument("--raydrop_loss", type=str, default="mse")
    p.add_argument("--flow_loss", type=bool, default=True)
    p.add_argument("--grad_loss", type=bool, default=True)
    p.add_argument("--alpha_d", type=float, default=1)
    p.add_argument("--alpha_i", type=float, default=0.1)
    p.add_argument("--alpha_r", type=float, default=0.01)
    p.add_argument("--alpha_grad", type=float, default=0.1)
    p.add_argument("--alpha_grad_norm", type=float, default=0.1)
    p.add_argument("--alpha_spatial", type=float, default=0.1)
    p.add_argument("--alpha_tv", type=float, default=0.1)
    p.add_argument("--grad_norm_smooth", action="store_true")
    p.add_argument("--spatial_smooth", action="store_true")
    p.add_argument("--tv_loss", action="store_true")
    p.add_argument("--sobel_grad", action="store_true")
    p.add_argument("--urf_loss", action="store_true")
    p.add_argument("--active_sensor", action="store_true")
    p.add_argument("--density_scale", type=float, default=1)
    p.add_argument("--intensity_scale", type=float, default=1)
    p.add_argument("--raydrop_ratio", type=float, default=0.5)
    p.add_argument("--smooth_factor", type=float, default=0.2)
    p.add_argument("--iters", type=int, default=30000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--fp16", type=bool, default=True)  # bf16 on TPU
    p.add_argument("--eval_interval", type=int, default=100)
    # framework extension (no reference analogue — the reference saves every
    # epoch, runner.py's train loop): save the full-state epoch checkpoint
    # every N epochs (always at the final epoch). On the tunneled v5e the
    # per-epoch save is ~13 s of device->host transfer vs a ~4 s step loop
    # (PERF.md r5), so long schedules set this to 5-10; crash-resume then
    # loses at most N-1 epochs. Best/eval checkpoints are unaffected.
    p.add_argument("--ckpt_interval", type=int, default=1)
    p.add_argument("--ckpt", type=str, default="latest")
    p.add_argument("--num_rays_lidar", type=int, default=1024)
    p.add_argument("--num_steps", type=int, default=768)
    p.add_argument("--patch_size_lidar", type=int, default=1)
    p.add_argument("--change_patch_size_lidar", nargs="+", type=int, default=[2, 8])
    p.add_argument("--change_patch_size_epoch", type=int, default=2)
    p.add_argument("--ema_decay", type=float, default=0.95)

    # framework-native extras (not in the reference)
    p.add_argument("--num_coarse", type=int, default=0,
                   help="hierarchical sampling: uniform coarse samples/ray "
                        "(0 = reference uniform num_steps sampling)")
    p.add_argument("--num_fine", type=int, default=0,
                   help="hierarchical sampling: importance samples/ray")
    p.add_argument("--flow_cloud_max_points", type=int, default=0,
                   help="subsample flow-loss point clouds to this many "
                        "points per frame (0 = full clouds, reference "
                        "behavior; the flow chamfer is O(P^2))")
    p.add_argument("--hier_warmup_iters", type=int, default=500,
                   help="train uniformly (num_coarse+num_fine samples) for "
                        "this many steps before switching to importance "
                        "sampling (the coarse pass needs a usable density)")
    p.add_argument("--remat_density", type=int, default=-1,
                   help="rematerialize the density query in backward "
                        "(1/0; -1 = auto: off when every encoder runs the "
                        "one-hot MXU path, on for gather-path tables)")
    p.add_argument("--density_chunk", type=int, default=-1,
                   help="max field-query points per chunk (0 = unchunked; "
                        "-1 = auto, matching remat_density)")
    p.add_argument("--num_devices", type=int, default=0,
                   help="shard ray batches over this many devices (0 = all)")
    p.add_argument("--mesh", type=str, default="dp",
                   choices=["dp", "dcn,ici"],
                   help="device mesh layout: 'dp' = 1-D ray data parallelism; "
                        "'dcn,ici' = hierarchical (hosts x per-host chips) "
                        "so the gradient psum rides each host's ICI ring "
                        "before one cross-host DCN reduce (pod scale)")
    p.add_argument("--num_hosts", type=int, default=0,
                   help="rows of the dcn,ici mesh (0 = jax.process_count())")
    p.add_argument("--max_epochs", type=int, default=0,
                   help="stop training after this many epochs while keeping "
                        "the --iters LR schedule (0 = train the full "
                        "schedule); for truncated A/B arms whose eval point "
                        "must share the full schedule's LR decay")
    p.add_argument("--profile", action="store_true",
                   help="capture a JAX profiler trace of a few steps")
    # synthetic data generation (dataloader = synthetic, data-free envs)
    p.add_argument("--synthetic_H", type=int, default=66)
    p.add_argument("--synthetic_W", type=int, default=1030)
    p.add_argument("--synthetic_seed", type=int, default=0)
    # small-model overrides for smoke configs
    p.add_argument("--flow_n_levels", type=int, default=8)
    p.add_argument("--flow_n_features", type=int, default=8)
    p.add_argument("--flow_log2_hashmap_size", type=int, default=18)
    p.add_argument("--flow_base_resolution", type=int, default=32)
    p.add_argument("--flow_max_resolution", type=int, default=8192)
    return p


def build_model_config(opt):
    """Map parsed options to LiDAR4DConfig (main_lidar4d.py:155-179)."""
    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig

    # auto memory policy: one-hot (custom_vjp) fields hold tiny residuals and
    # run fastest unchunked/un-remat'ed; gather-path fields need chunk+remat
    # (see models/renderer.py)
    onehot_field = (
        opt.log2_hashmap_size <= 12
        and max(opt.hash_size_dynamic) <= 12
        and opt.flow_log2_hashmap_size <= 12
    )
    remat = (not onehot_field) if opt.remat_density < 0 else bool(opt.remat_density)
    chunk = (0 if onehot_field else 32768) if opt.density_chunk < 0 else opt.density_chunk

    return LiDAR4DConfig(
        remat_density=remat,
        density_chunk=chunk,
        min_resolution=opt.min_resolution,
        base_resolution=opt.base_resolution,
        max_resolution=opt.max_resolution,
        time_resolution=opt.time_resolution,
        n_levels_plane=opt.n_levels_plane,
        n_features_per_level_plane=opt.n_features_per_level_plane,
        plane_hash_scales=opt.plane_hash_scales,
        plane_hash_log2=opt.plane_hash_log2,
        n_levels_hash=opt.n_levels_hash,
        n_features_per_level_hash=opt.n_features_per_level_hash,
        log2_hashmap_size=opt.log2_hashmap_size,
        hash_size_dynamic=tuple(opt.hash_size_dynamic),
        num_layers_flow=opt.num_layers_flow,
        hidden_dim_flow=opt.hidden_dim_flow,
        num_layers_sigma=opt.num_layers_sigma,
        hidden_dim_sigma=opt.hidden_dim_sigma,
        geo_feat_dim=opt.geo_feat_dim,
        num_layers_lidar=opt.num_layers_lidar,
        hidden_dim_lidar=opt.hidden_dim_lidar,
        out_lidar_dim=opt.out_lidar_dim,
        num_frames=opt.num_frames,
        bound=opt.bound,
        near_lidar=opt.near_lidar,  # callers pre-scale (main_lidar4d.py:152-153)
        far_lidar=opt.far_lidar,
        density_scale=opt.density_scale,
        active_sensor=opt.active_sensor,
        flow_n_levels=opt.flow_n_levels,
        flow_n_features=opt.flow_n_features,
        flow_log2_hashmap_size=opt.flow_log2_hashmap_size,
        flow_base_resolution=opt.flow_base_resolution,
        flow_max_resolution=opt.flow_max_resolution,
    )


def build_loss_config(opt):
    from lidar4d_tpu.train.losses import LossConfig

    return LossConfig(
        depth_loss=opt.depth_loss,
        depth_grad_loss=opt.depth_grad_loss,
        intensity_loss=opt.intensity_loss,
        raydrop_loss=opt.raydrop_loss,
        flow_loss=opt.flow_loss,
        grad_loss=opt.grad_loss,
        urf_loss=opt.urf_loss,
        alpha_d=opt.alpha_d,
        alpha_i=opt.alpha_i,
        alpha_r=opt.alpha_r,
        alpha_grad=opt.alpha_grad,
        alpha_grad_norm=opt.alpha_grad_norm,
        alpha_spatial=opt.alpha_spatial,
        alpha_tv=opt.alpha_tv,
        grad_norm_smooth=opt.grad_norm_smooth,
        spatial_smooth=opt.spatial_smooth,
        tv_loss=opt.tv_loss,
        sobel_grad=opt.sobel_grad,
        smooth_factor=opt.smooth_factor,
        scale=opt.scale,
        num_frames=opt.num_frames,
        iters=opt.iters,
    )
