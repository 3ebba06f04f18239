"""Structural similarity, skimage-compatible.

The reference calls `skimage.metrics.structural_similarity(pred, gt,
data_range=max(gt)-min(gt))` (`utils/metrics.py:80-82,151-153`). skimage is
not in this image, so this reimplements its exact default path for 2D float
images: 7x7 uniform filter, K1=0.01, K2=0.03, sample covariance normalization
N/(N-1), and the mean taken over the interior crop of (win-1)/2 — which makes
the filter's boundary mode irrelevant.
"""

import numpy as np
from scipy.ndimage import uniform_filter


def structural_similarity(im1, im2, data_range, win_size=7, K1=0.01, K2=0.03):
    im1 = np.asarray(im1, np.float64)
    im2 = np.asarray(im2, np.float64)
    if im1.shape != im2.shape:
        raise ValueError("input shapes must match")

    NP = win_size ** im1.ndim
    cov_norm = NP / (NP - 1)  # sample covariance

    ux = uniform_filter(im1, size=win_size)
    uy = uniform_filter(im2, size=win_size)
    uxx = uniform_filter(im1 * im1, size=win_size)
    uyy = uniform_filter(im2 * im2, size=win_size)
    uxy = uniform_filter(im1 * im2, size=win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2

    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win_size - 1) // 2
    interior = S[pad:-pad, pad:-pad] if pad else S
    return float(interior.mean())
