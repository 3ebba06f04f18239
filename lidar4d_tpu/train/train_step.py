"""The jitted LiDAR4D training step.

Re-design of the reference's `Trainer.train_step` (`model/runner.py:166-377`)
as a single pure function: ray sampling, rendering, the composite loss
(depth / raydrop-smoothed / intensity, batch chamfer, flow consistency +
ground regularization, patch gradient, optional URF line-of-sight), gradient
and the grouped-Adam update all happen inside one compiled graph.

Idiomatic departures from the CUDA original (math preserved):
  * ray sampling moved in-graph (the reference samples in the DataLoader
    collate, kitti360_dataset.py:152-189);
  * the per-frame Python dict of variable-length point clouds for the flow
    loss (runner.py:224-251) becomes a padded [F, P, 3] array with sentinel
    padding + masks, and the four neighbor chamfer calls batch into one
    vmapped chamfer of shape [4, P, 3];
  * fp16 AMP becomes bf16 matmul compute inside the field (ops/mlp.py);
  * the patch/random sampling mode switch (runner.py:699-705) compiles as
    two step variants selected per epoch by the trainer.
"""

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from lidar4d_tpu.models.renderer import render_rays
from lidar4d_tpu.ops.chamfer import chamfer_distance_fast
from lidar4d_tpu.ops.rays import get_lidar_rays
from lidar4d_tpu.parallel.mesh import gather_rays, shard_rays
from lidar4d_tpu.train.ema import EmaState, ema_init
from lidar4d_tpu.train.losses import (
    LossConfig,
    conv2d_same,
    cosine_similarity,
    elementwise_loss,
    sobel_kernels,
)
from lidar4d_tpu.train.optimizer import make_optimizer


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: EmaState
    step: Any  # int32 scalar


def init_train_state(field, key, lr=1e-2, iters=30000):
    params = field.init(key)
    labels = field.param_group_labels(params)
    opt = make_optimizer(lr, iters, labels)
    return (
        TrainState(
            params=params,
            opt_state=opt.init(params),
            ema=ema_init(params),
            step=jnp.int32(0),
        ),
        opt,
    )


# --------------------------------------------------------------------- losses
def _gradient_loss(pred_depth, gt_depth, gt_raydrop, cfg: LossConfig, px, py):
    """Patch-mode gradient losses (runner.py:278-369). Inputs [N] flat."""
    crit = elementwise_loss(cfg.depth_grad_loss, cfg.scale)
    pd = pred_depth.reshape(-1, 1, px, py) / cfg.scale
    gt = gt_depth.reshape(-1, 1, px, py) / cfg.scale
    rd = gt_raydrop.reshape(-1, 1, px, py)

    if cfg.sobel_grad:
        kx, ky = sobel_kernels()
        pred_gx = conv2d_same(pd, kx)
        pred_gy = conv2d_same(pd, ky)
        gt_gx = conv2d_same(gt, kx)
        gt_gy = conv2d_same(gt, ky)
    else:
        pred_gy = jnp.abs(pd[:, :, :-1, :] - pd[:, :, 1:, :])
        pred_gx = jnp.abs(pd[:, :, :, :-1] - pd[:, :, :, 1:])
        gt_gy = gt[:, :, :-1, :] - gt[:, :, 1:, :]
        gt_gx = gt[:, :, :, :-1] - gt[:, :, :, 1:]

    dy = jnp.abs(pred_gy)
    dx = jnp.abs(pred_gx)

    loss = 0.0
    if cfg.grad_norm_smooth:
        loss += cfg.alpha_grad_norm * (jnp.mean(jnp.exp(-dx)) + jnp.mean(jnp.exp(-dy)))
    if cfg.spatial_smooth:
        loss += cfg.alpha_spatial * (jnp.mean(dx**2) + jnp.mean(dy**2))
    if cfg.tv_loss:
        loss += cfg.alpha_tv * (jnp.mean(dx) + jnp.mean(dy))

    if cfg.grad_loss:
        grad_clip = 0.01
        mask_x = (jnp.abs(gt_gx) < grad_clip).astype(jnp.float32)
        mask_y = (jnp.abs(gt_gy) < grad_clip).astype(jnp.float32)
        if cfg.sobel_grad:
            mdx = rd * mask_x
        else:
            mdx = rd[:, :, :, :-1] * mask_x
            mask_y = rd[:, :, :-1, :] * mask_y  # noqa: F841 (parity: unused for l1-x)
        if cfg.depth_grad_loss == "cos":
            pn = pred_gx.shape[0]
            g = cosine_similarity(
                (pred_gx * mdx).reshape(pn, -1), (gt_gx * mdx).reshape(pn, -1)
            )
            gl = jnp.sum(1.0 - g)
        else:
            gl = jnp.sum(crit(pred_gx * mdx, gt_gx * mdx))
        loss += cfg.alpha_grad * gl
    return loss


def _flow_loss(field, params, flow_cache, frame_idx, t, key, cfg: LossConfig):
    """Flow consistency + ground regularization (runner.py:222-253).

    flow_cache: dict(
      points  [F, P, 3]  world-frame clouds, sentinel-padded,
      mask    [F, P]     valid-point mask,
      valid   [F]        frame-exists mask,
      ground  [F, Pg, 3] ground points, sentinel-padded,
      gmask   [F, Pg])
    """
    points = flow_cache["points"]
    mask = flow_cache["mask"]
    valid = flow_cache["valid"]
    F = points.shape[0]

    pc = points[frame_idx]          # [P, 3]
    pc_m = mask[frame_idx]          # [P]
    flow = field.flow(params, pc, t)
    fwd, bwd = flow["forward"], flow["backward"]

    # four neighbor pairs: +1, -1, +2, -2  (two-step consistency)
    steps = jnp.asarray([1, -1, 2, -2], jnp.int32)
    nbr_idx = jnp.clip(frame_idx + steps, 0, F - 1)
    nbr_exists = (
        (frame_idx + steps >= 0)
        & (frame_idx + steps <= F - 1)
        & (valid[nbr_idx] > 0)
        & (valid[frame_idx] > 0)
    ).astype(jnp.float32)

    preds = jnp.stack(
        [pc + fwd * 1.0, pc + bwd * 1.0, pc + fwd * 2.0, pc + bwd * 2.0]
    )  # [4, P, 3]
    targets = points[nbr_idx]        # [4, P, 3]
    t_masks = mask[nbr_idx]          # [4, P]

    d1, d2, _, _ = chamfer_distance_fast(preds, targets)
    d1 = d1 * pc_m[None, :]
    d2 = d2 * t_masks
    per_pair = 0.5 * (jnp.sum(d1, axis=1) + jnp.sum(d2, axis=1))  # [4]
    loss = jnp.sum(per_pair * nbr_exists)

    # ground zero-flow at a random time (runner.py:250-253)
    ground = flow_cache["ground"][frame_idx]
    gmask = flow_cache["gmask"][frame_idx]
    t_rand = jax.random.uniform(key)
    zf = field.flow(params, ground, t_rand)
    g_abs = (jnp.abs(zf["forward"]) + jnp.abs(zf["backward"])) * gmask[:, None]
    loss += 0.001 * jnp.sum(g_abs) * valid[frame_idx]
    return loss


def _urf_loss(weights, z_vals, gt_depth, step, cfg: LossConfig):
    """Line-of-sight loss (runner.py:256-276)."""
    eps = 0.02 * 0.1 ** jnp.minimum(step / cfg.iters, 1.0)
    gt = gt_depth.reshape(z_vals.shape[0], 1)
    depth_mask = (gt > 0.0).astype(jnp.float32)
    n_valid = jnp.maximum(jnp.sum(depth_mask), 1.0)

    mask_empty = ((z_vals < gt - eps) | (z_vals > gt + eps)).astype(jnp.float32)
    loss_empty = jnp.sum((mask_empty * weights) ** 2) / n_valid

    mask_near = ((z_vals > gt - eps) & (z_vals < gt + eps)).astype(jnp.float32)
    distance = mask_near * (z_vals - gt)
    sigma = eps / 3.0
    distr = (
        1.0 / (sigma * jnp.sqrt(2 * jnp.pi)) * jnp.exp(-(distance**2) / (2 * sigma**2))
    )
    distr = distr / jnp.maximum(jnp.max(distr), 1e-12)
    distr = distr * mask_near
    loss_near = jnp.sum((mask_near * weights - distr) ** 2) / n_valid
    return 0.1 * loss_empty + 0.1 * loss_near


# ----------------------------------------------------------------- the step
def make_train_step(
    field,
    opt,
    loss_cfg: LossConfig,
    *,
    H,
    W,
    fov_lidar,
    num_rays=1024,
    num_steps=768,
    patch_size=1,
    mesh=None,
    num_coarse=0,
    num_fine=0,
):
    """Build a jitted train step for one sampling mode.

    Returns step(state, frame, flow_cache, key) -> (state, metrics) where
    frame = dict(pose [4,4], image [H,W,3] as (raydrop, intensity,
    depth*scale), time scalar).

    With `mesh` (a 1-D data mesh from parallel.mesh.make_mesh), the sampled
    ray batch is sharded over the mesh's data axis — GSPMD propagates the
    partitioning through the renderer/field and inserts the gradient psum
    over ICI; parameters stay replicated. `num_rays` must be divisible by
    the mesh size.
    """
    cfg = loss_cfg
    if isinstance(patch_size, int):
        px, py = patch_size, patch_size
    elif len(patch_size) == 1:
        px, py = patch_size[0], patch_size[0]
    else:
        px, py = patch_size

    depth_crit = elementwise_loss(cfg.depth_loss, cfg.scale)
    raydrop_crit = elementwise_loss(cfg.raydrop_loss, cfg.scale)
    intensity_crit = elementwise_loss(cfg.intensity_loss, cfg.scale)

    def loss_fn(params, frame, flow_cache, key, step):
        k_rays, k_perturb, k_flow = jax.random.split(key, 3)
        rays = get_lidar_rays(
            frame["pose"], fov_lidar, H, W,
            key=k_rays, N=num_rays, patch_size=(px, py) if px > 1 else 1,
        )
        rays_o, rays_d, inds = rays["rays_o"], rays["rays_d"], rays["inds"]
        if mesh is not None:
            rays_o, rays_d, inds = shard_rays(mesh, rays_o, rays_d, inds)
        t = frame["time"]

        pixels = frame["image"].reshape(-1, 3)[inds]  # [N, 3]
        gt_raydrop = pixels[:, 0]
        gt_intensity = pixels[:, 1] * gt_raydrop
        gt_depth = pixels[:, 2] * gt_raydrop

        out = render_rays(
            field, params, rays_o, rays_d, t,
            key=k_perturb, num_steps=num_steps, perturb=True, with_aux=True,
            num_coarse=num_coarse, num_fine=num_fine,
        )
        pred_raydrop = out["image_lidar"][:, 0]
        pred_intensity = out["image_lidar"][:, 1] * gt_raydrop
        pred_depth = out["depth_lidar"] * gt_raydrop

        if cfg.raydrop_loss == "bce":
            pred_raydrop_for_loss = jax.nn.sigmoid(pred_raydrop)
        else:
            pred_raydrop_for_loss = pred_raydrop
        smooth = cfg.smooth_factor
        gt_raydrop_smooth = jnp.clip(gt_raydrop, smooth, 1.0 - smooth)

        lidar_loss = (
            cfg.alpha_d * depth_crit(pred_depth, gt_depth)
            + cfg.alpha_r * raydrop_crit(pred_raydrop_for_loss, gt_raydrop_smooth)
            + cfg.alpha_i * intensity_crit(pred_intensity, gt_intensity)
        )
        loss = jnp.sum(lidar_loss)  # .sum() over rays (runner.py:213)
        metrics = {"lidar_loss": loss}

        # batch chamfer CD loss (runner.py:216-220); the point sets are tiny
        # (num_rays x 3) — gather them once so the tiled scan inside chamfer
        # sees replicated operands (no per-tile collective).
        pred_lidar = rays_d * pred_depth[:, None] / cfg.scale
        gt_lidar = rays_d * gt_depth[:, None] / cfg.scale
        if mesh is not None:
            pred_lidar, gt_lidar = gather_rays(mesh, pred_lidar, gt_lidar)
        d1, d2, _, _ = chamfer_distance_fast(pred_lidar[None], gt_lidar[None])
        chamfer_l = jnp.mean(d1 + d2) * 0.5
        loss = loss + chamfer_l
        metrics["chamfer_loss"] = chamfer_l

        if cfg.flow_loss and flow_cache is not None:
            frame_idx = jnp.floor(t * (cfg.num_frames - 1) + 0.5).astype(jnp.int32)
            fl = _flow_loss(field, params, flow_cache, frame_idx, t, k_flow, cfg)
            loss = loss + fl
            metrics["flow_loss"] = fl

        if cfg.urf_loss:
            ul = _urf_loss(out["weights"], out["z_vals"], gt_depth, step, cfg)
            loss = loss + ul
            metrics["urf_loss"] = ul

        if px > 1:
            gl = _gradient_loss(pred_depth, gt_depth, gt_raydrop, cfg, px, py)
            loss = loss + gl
            metrics["grad_loss"] = gl

        metrics["loss"] = loss
        return loss, metrics

    @jax.jit
    def step(state: TrainState, frame, flow_cache, key):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, frame, flow_cache, key, state.step
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            ema=state.ema,
            step=state.step + 1,
        )
        return new_state, metrics

    return step
