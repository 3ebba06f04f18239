"""C++ preprocessing extension vs the pure-python references."""

import numpy as np
import pytest

from lidar4d_tpu import native
from lidar4d_tpu.ops.pano import lidar_to_pano_with_intensities

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def _random_scan(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    az = rng.uniform(-np.pi, np.pi, n)
    el = rng.uniform(np.radians(-24.9), np.radians(2.0), n)
    r = rng.uniform(2, 70, n)
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = r * np.cos(el) * np.cos(az)
    pts[:, 1] = r * np.cos(el) * np.sin(az)
    pts[:, 2] = r * np.sin(el)
    pts[:, 3] = rng.uniform(0, 1, n)
    return pts


def test_native_pano_matches_python():
    pts = _random_scan()
    H, W, K = 22, 103, (2.0, 26.9)
    pano_py, int_py = lidar_to_pano_with_intensities(pts, H, W, K)
    pano_c, int_c = native.lidar_to_pano_native(pts, H, W, *K)
    np.testing.assert_allclose(pano_c, pano_py, rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(int_c, int_py, rtol=1e-6, atol=1e-9)


def test_native_knn_outlier_matches_scipy():
    from scipy.spatial import cKDTree

    rng = np.random.default_rng(1)
    pts = rng.normal(size=(3000, 3)).astype(np.float32)
    pts[:20] *= 10  # clear outliers
    k, ratio = 16, 2.0

    mask_c = native.knn_outlier_mask_native(pts, k, ratio)

    tree = cKDTree(pts)
    d, _ = tree.query(pts, k=k + 1)
    mean_d = d[:, 1:].mean(axis=1)
    mask_py = mean_d < mean_d.mean() + ratio * mean_d.std()

    assert (mask_c == mask_py).mean() > 0.999  # f32 vs f64 boundary ties
    assert mask_c[:20].sum() < 5  # outliers rejected
