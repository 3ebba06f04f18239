"""LPIPS perceptual metric in JAX (AlexNet backbone + linear calibration).

The reference uses `lpips.LPIPS(net='alex')` (`utils/metrics.py:35,106`) on
depth/intensity panos: a 2D [H, W] map is broadcast against the scaling
layer's [1, 3, 1, 1] constants, i.e. replicated to 3 identical channels —
that quirk is preserved here.

This environment has no network egress and no torchvision/lpips weights, so:
  * if `LIDAR4D_LPIPS_WEIGHTS` points to an .npz with the official AlexNet
    conv weights + LPIPS linear weights, they are loaded (exact LPIPS);
    `scripts/export_lpips_weights.py` produces that file on a machine that
    has torchvision + lpips;
  * otherwise a DETERMINISTIC randomly-initialized AlexNet with uniform
    linear heads is used. Random-feature perceptual distances are a known
    usable surrogate (correlate with perceptual similarity), but absolute
    values are NOT comparable with published LPIPS numbers — meters report
    which mode produced them via `is_calibrated`.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_ch, kernel, stride, padding), pool after 1,2,5
_ALEX_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_TAP_CHANNELS = (64, 192, 384, 256, 256)

# LPIPS scaling layer constants (imagenet-ish normalization in [-1,1] space)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _default_weights(seed=0):
    rng = np.random.default_rng(seed)
    params = {}
    in_ch = 3
    for i, (out_ch, k, _, _) in enumerate(_ALEX_CONVS):
        fan_in = in_ch * k * k
        std = (2.0 / fan_in) ** 0.5
        params[f"conv{i}_w"] = rng.normal(0, std, (out_ch, in_ch, k, k)).astype(np.float32)
        params[f"conv{i}_b"] = np.zeros((out_ch,), np.float32)
        in_ch = out_ch
    for i, ch in enumerate(_TAP_CHANNELS):
        params[f"lin{i}"] = np.full((ch,), 1.0 / ch, np.float32)
    return params


# Default drop-in location for exported calibration weights (README
# "Metric caveats"): scripts/export_lpips_weights.py writes this file on a
# machine with torchvision+lpips; its presence flips every LPIPS surface
# to calibrated mode.
_DEFAULT_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    "data", "lpips_alexnet.npz",
)


def load_weights():
    path = os.environ.get("LIDAR4D_LPIPS_WEIGHTS", "") or (
        _DEFAULT_WEIGHTS_PATH
        if os.path.exists(_DEFAULT_WEIGHTS_PATH) else ""
    )
    if path and os.path.exists(path):
        data = dict(np.load(path))
        return data, True
    return _default_weights(), False


@partial(jax.jit, static_argnames=())
def _lpips_forward(params, x0, x1):
    """x0/x1: [B, 3, H, W] in [-1, 1]."""

    def net(x):
        h = (x - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
        taps = []
        for i, (_, k, s, p) in enumerate(_ALEX_CONVS):
            h = jax.lax.conv_general_dilated(
                h, params[f"conv{i}_w"], (s, s), [(p, p), (p, p)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + params[f"conv{i}_b"][None, :, None, None]
            h = jax.nn.relu(h)
            taps.append(h)
            if i in (0, 1):  # AlexNet pools after relu1 and relu2
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
                )
        return taps

    taps0 = net(x0)
    taps1 = net(x1)
    total = 0.0
    for i, (t0, t1) in enumerate(zip(taps0, taps1)):
        n0 = t0 / jnp.sqrt(jnp.sum(t0**2, axis=1, keepdims=True) + 1e-10)
        n1 = t1 / jnp.sqrt(jnp.sum(t1**2, axis=1, keepdims=True) + 1e-10)
        diff = (n0 - n1) ** 2
        w = params[f"lin{i}"][None, :, None, None]
        total = total + jnp.mean(jnp.sum(diff * w, axis=1), axis=(1, 2))
    return total


class LPIPS:
    """Callable LPIPS meter; accepts [H, W] maps (replicated to 3ch) or
    [3, H, W] / [B, 3, H, W] images in [0, 1] (normalize=True semantics)."""

    def __init__(self):
        weights, self.is_calibrated = load_weights()
        self.params = {k: jnp.asarray(v) for k, v in weights.items()}

    def __call__(self, pred, gt):
        pred = jnp.asarray(pred, jnp.float32)
        gt = jnp.asarray(gt, jnp.float32)
        if pred.ndim == 2:
            pred = jnp.broadcast_to(pred[None, None], (1, 3) + pred.shape)
            gt = jnp.broadcast_to(gt[None, None], (1, 3) + gt.shape)
        elif pred.ndim == 3:
            pred, gt = pred[None], gt[None]
        # normalize=True: [0,1] -> [-1,1]
        pred = 2 * pred - 1
        gt = 2 * gt - 1
        return float(_lpips_forward(self.params, pred, gt)[0])
