"""Loss primitives and the composite LiDAR4D training loss config.

Parity map to the reference:
  * elementwise criteria (l1 / mse / bce / huber / cos) — the loss_dict in
    `main_lidar4d.py:183-195` (all reduction='none');
  * composite weights & semantics — `Trainer.train_step`
    (`model/runner.py:166-377`): see `train_step.py` for the assembly.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def l1(pred, gt):
    return jnp.abs(pred - gt)


def mse(pred, gt):
    return (pred - gt) ** 2


def bce_with_logits(pred, gt):
    # torch BCEWithLogitsLoss(reduction='none')
    return jnp.maximum(pred, 0) - pred * gt + jnp.log1p(jnp.exp(-jnp.abs(pred)))


def bce(pred, gt, eps=1e-7):
    p = jnp.clip(pred, eps, 1 - eps)
    return -(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p))


def huber(delta):
    def fn(pred, gt):
        err = jnp.abs(pred - gt)
        quad = 0.5 * err**2
        lin = delta * (err - 0.5 * delta)
        return jnp.where(err < delta, quad, lin)

    return fn


def cosine_similarity(pred, gt, axis=-1, eps=1e-8):
    # torch CosineSimilarity default dim=1; callers reshape accordingly
    num = jnp.sum(pred * gt, axis=axis)
    den = jnp.maximum(
        jnp.linalg.norm(pred, axis=axis) * jnp.linalg.norm(gt, axis=axis), eps
    )
    return num / den


def elementwise_loss(name, scale=1.0):
    """Resolve a criterion name the way main_lidar4d.py:183-195 does."""
    if name == "l1":
        return l1
    if name == "mse":
        return mse
    if name == "bce":
        return bce_with_logits
    if name == "huber":
        return huber(0.2 * scale)
    if name == "cos":
        return cosine_similarity
    raise ValueError(f"unknown loss {name}")


@dataclass(frozen=True)
class LossConfig:
    """Training-loss knobs, names/defaults match the reference CLI
    (main_lidar4d.py:63-101)."""

    depth_loss: str = "l1"
    depth_grad_loss: str = "l1"
    intensity_loss: str = "mse"
    raydrop_loss: str = "mse"
    flow_loss: bool = True
    grad_loss: bool = True
    urf_loss: bool = False
    alpha_d: float = 1.0
    alpha_i: float = 0.1
    alpha_r: float = 0.01
    alpha_grad: float = 0.1
    alpha_grad_norm: float = 0.1
    alpha_spatial: float = 0.1
    alpha_tv: float = 0.1
    grad_norm_smooth: bool = False
    spatial_smooth: bool = False
    tv_loss: bool = False
    sobel_grad: bool = False
    smooth_factor: float = 0.2
    scale: float = 0.01
    num_frames: int = 51
    iters: int = 30000


def sobel_kernels():
    gx = jnp.asarray(
        [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], jnp.float32
    )
    gy = jnp.asarray(
        [[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], jnp.float32
    )
    return gx, gy


def conv2d_same(img, kernel):
    """img [B,1,H,W], kernel [kh,kw] -> [B,1,H,W] (padding=1 conv)."""
    k = kernel[None, None]
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
