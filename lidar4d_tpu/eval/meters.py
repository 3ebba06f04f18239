"""Evaluation metric meters, semantics-parity with `utils/metrics.py`.

  * DepthMeter     — RMSE, MedAE, LPIPS, SSIM, PSNR (metrics.py:30-98)
  * IntensityMeter — same errors on intensity (metrics.py:101-169)
  * RaydropMeter   — RMSE, Acc, F1@0.5 (metrics.py:172-226)
  * PointsMeter    — Chamfer distance + F-score@0.05 on back-projected
                     point clouds (metrics.py:229-280); the chamfer runs on
                     the TPU via ops.chamfer instead of the CUDA extension.

All meters accept numpy or jax arrays shaped [B, H, W] (B=1) like the
reference and accumulate per-frame results.
"""

import numpy as np
import jax.numpy as jnp

from lidar4d_tpu.eval.lpips_jax import LPIPS
from lidar4d_tpu.eval.ssim import structural_similarity
from lidar4d_tpu.ops.chamfer import chamfer_distance
from lidar4d_tpu.ops.pano import pano_to_lidar

_lpips_singleton = None


def _get_lpips():
    global _lpips_singleton
    if _lpips_singleton is None:
        _lpips_singleton = LPIPS()
    return _lpips_singleton


def fscore(dist1, dist2, threshold=0.001):
    """F-score on squared NN distances (metrics.py:13-27)."""
    precision_1 = np.mean(dist1 < threshold, axis=1)
    precision_2 = np.mean(dist2 < threshold, axis=1)
    denom = precision_1 + precision_2
    f = np.where(denom > 0, 2 * precision_1 * precision_2 / np.maximum(denom, 1e-12), 0.0)
    return f, precision_1, precision_2


def _to_numpy(*arrays):
    return [np.asarray(a, np.float64) for a in arrays]


class _ImageErrorMeter:
    """Shared RMSE/MedAE/LPIPS/SSIM/PSNR machinery for depth & intensity."""

    def __init__(self, scale, max_value, use_lpips=True):
        self.V = []
        self.N = 0
        self.scale = scale
        self.max_value = max_value
        self.use_lpips = use_lpips

    def clear(self):
        self.V = []
        self.N = 0

    def update(self, preds, truths):
        pred, gt = _to_numpy(preds, truths)
        pred = pred / self.scale
        gt = gt / self.scale
        lo = 1e-6
        hi = self.max_value
        pred = np.clip(pred, lo, hi)
        gt = np.clip(gt, lo, hi)

        rmse = float(np.sqrt(np.mean((gt - pred) ** 2)))
        medae = float(np.median(np.abs(gt - pred)))
        if self.use_lpips:
            lp = _get_lpips()(pred.squeeze(0), gt.squeeze(0))
        else:
            lp = 0.0
        ssim = structural_similarity(
            pred.squeeze(0), gt.squeeze(0), data_range=float(gt.max() - gt.min())
        )
        psnr = float(10 * np.log10(hi**2 / np.mean((pred - gt) ** 2)))
        self.V.append([rmse, medae, lp, ssim, psnr])
        self.N += 1

    def measure(self):
        assert self.N == len(self.V)
        return np.array(self.V).mean(0)

    @property
    def lpips_calibrated(self):
        """True iff LPIPS runs on the official AlexNet+linear weights.

        Without them (no-egress envs) the LPIPS column is a deterministic
        random-feature SURROGATE: usable for relative comparison within this
        repo, NOT comparable to published LPIPS numbers
        (reference utils/metrics.py:35,106 uses lpips.LPIPS(net='alex'))."""
        return bool(self.use_lpips and _get_lpips().is_calibrated)

    def _lpips_note(self):
        if not self.use_lpips:
            return " [LPIPS disabled]"
        return "" if self.lpips_calibrated else " [LPIPS surrogate: UNCALIBRATED random-feature mode]"

    def write(self, writer, global_step, prefix="", suffix=""):
        writer.add_scalar(f"{prefix}/{self.tag} error{suffix}",
                          self.measure()[0], global_step)


class DepthMeter(_ImageErrorMeter):
    tag = "depth"

    def __init__(self, scale, use_lpips=True):
        super().__init__(scale, max_value=80.0, use_lpips=use_lpips)

    def report(self):
        return f"Depth_error (RMSE, MedAE, LPIPS, SSIM, PSNR) = {self.measure()}{self._lpips_note()}"


class IntensityMeter(_ImageErrorMeter):
    tag = "intensity"

    def __init__(self, scale, use_lpips=True):
        super().__init__(scale, max_value=1.0, use_lpips=use_lpips)

    def report(self):
        return f"Inten_error (RMSE, MedAE, LPIPS, SSIM, PSNR) = {self.measure()}{self._lpips_note()}"


class RaydropMeter:
    def __init__(self, ratio=0.5):
        self.V = []
        self.N = 0
        self.ratio = ratio

    def clear(self):
        self.V = []
        self.N = 0

    def update(self, preds, truths):
        pred, gt = _to_numpy(preds, truths)
        rmse = float(np.sqrt(np.mean((gt - pred) ** 2)))
        pred_mask = np.where(pred > self.ratio, 1, 0)
        acc = float((pred_mask == gt).mean())

        TP = np.sum((gt == 1) & (pred_mask == 1))
        FP = np.sum((gt == 0) & (pred_mask == 1))
        FN = np.sum((gt == 1) & (pred_mask == 0))
        precision = TP / max(TP + FP, 1)
        recall = TP / max(TP + FN, 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-12)
        self.V.append([rmse, acc, float(f1)])
        self.N += 1

    def measure(self):
        assert self.N == len(self.V)
        return np.array(self.V).mean(0)

    def write(self, writer, global_step, prefix="", suffix=""):
        writer.add_scalar(f"{prefix}/raydrop error", self.measure()[0], global_step)

    def report(self):
        return f"Rdrop_error (RMSE, Acc, F1) = {self.measure()}"


class PointsMeter:
    def __init__(self, scale, intrinsics):
        self.V = []
        self.N = 0
        self.scale = scale
        self.intrinsics = intrinsics

    def clear(self):
        self.V = []
        self.N = 0

    def update(self, preds, truths):
        pred, gt = _to_numpy(preds, truths)
        pred = pred / self.scale
        gt = gt / self.scale
        pred_lidar = pano_to_lidar(pred[0], self.intrinsics).astype(np.float32)
        gt_lidar = pano_to_lidar(gt[0], self.intrinsics).astype(np.float32)

        if len(pred_lidar) == 0 or len(gt_lidar) == 0:
            self.V.append([np.inf, 0.0])
            self.N += 1
            return

        # Bucket-pad to multiples of 8192 with a far sentinel so the chamfer
        # jit sees a handful of static shapes instead of one per frame —
        # variable point counts (raydrop-masked clouds) otherwise recompile
        # every update (~18 s/frame measured, the whole eval-meters budget).
        # Sentinel points are 1e6 away: never the argmin for any real point,
        # and their own distances are sliced off before the reduction.
        n1, n2 = len(pred_lidar), len(gt_lidar)

        def _pad(c):
            b = ((len(c) + 8191) // 8192) * 8192
            return np.concatenate(
                [c, np.full((b - len(c), 3), 1e6, np.float32)], 0
            )

        d1, d2, _, _ = chamfer_distance(
            jnp.asarray(_pad(pred_lidar))[None], jnp.asarray(_pad(gt_lidar))[None]
        )
        d1 = np.asarray(d1)[:, :n1]
        d2 = np.asarray(d2)[:, :n2]
        chamfer = float(d1.mean() + d2.mean())
        f, _, _ = fscore(d1, d2, threshold=0.05)  # monoSDF threshold
        self.V.append([chamfer, float(f[0])])
        self.N += 1

    def measure(self):
        assert self.N == len(self.V)
        return np.array(self.V).mean(0)

    def write(self, writer, global_step, prefix="", suffix=""):
        writer.add_scalar(f"{prefix}/CD", self.measure()[0], global_step)

    def report(self):
        return f"Point_error (CD, F-score) = {self.measure()}"
