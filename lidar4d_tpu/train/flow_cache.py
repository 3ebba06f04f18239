"""Point-cloud cache for the flow-consistency loss.

Equivalent of `Trainer.process_pointcloud` (`model/runner.py:924-953`): for
every train frame, back-project the GT range image, run ground removal
(`utils/pointcloud.point_removal`), transform to scaled world coordinates and
cache (points, ground). The reference keeps Python dicts of variable-length
numpy arrays and copies them to the GPU every step (runner.py:225-251); here
the clouds are padded to a common size with a far-away sentinel and stacked
into device-resident [F, P, 3] arrays + masks so the flow loss jits.
"""

import numpy as np

from lidar4d_tpu.ops.chamfer import _PAD_SENTINEL
from lidar4d_tpu.ops.pano import pano_to_lidar
from lidar4d_tpu.utils.pointcloud import point_removal


def _pad_stack(clouds, num_frames, frame_indices, align=1024):
    sizes = [len(c) for c in clouds] or [1]
    pmax = max(sizes)
    pmax = ((pmax + align - 1) // align) * align
    points = np.full((num_frames, pmax, 3), _PAD_SENTINEL, np.float32)
    mask = np.zeros((num_frames, pmax), np.float32)
    for fi, c in zip(frame_indices, clouds):
        n = len(c)
        points[fi, :n] = c
        mask[fi, :n] = 1.0
    return points, mask


def build_flow_cache(dataset, scale, num_frames_total, verbose=False,
                     max_points=0, seed=0):
    """dataset: a refine-split KITTI360Dataset (full train frames).

    max_points > 0 subsamples each frame's (non-ground) cloud to at most
    that many points — the flow-consistency chamfer is O(P^2) per neighbor
    pair, and real KITTI-360 clouds reach ~60k points (framework extra; the
    reference always uses the full clouds, runner.py:924-953).
    """
    rng = np.random.default_rng(seed)
    clouds, grounds, fidx = [], [], []
    for i in range(len(dataset)):
        img = dataset.images_lidar[i]
        raydrop = img[..., 0]
        depth = img[..., 2] * raydrop  # scaled depth
        gt_lidar = pano_to_lidar(
            np.asarray(depth, np.float64) / scale, dataset.intrinsics_lidar
        )
        points, ground = point_removal(gt_lidar)
        if max_points and len(points) > max_points:
            points = points[rng.choice(len(points), max_points, replace=False)]
        if max_points and len(ground) > max_points // 4:
            ground = ground[
                rng.choice(len(ground), max_points // 4, replace=False)
            ]

        pose = np.asarray(dataset.poses_lidar[i], np.float64)
        for arr, dest in ((points, clouds), (ground, grounds)):
            a = arr * scale
            a = np.hstack([a, np.ones((len(a), 1))])
            dest.append(((pose @ a.T).T[:, :3]).astype(np.float32))

        t = float(dataset.times[i])
        fidx.append(int(round(t * (num_frames_total - 1))))
        if verbose and i % 10 == 0:
            print(f"flow cache {i + 1}/{len(dataset)}")

    points, mask = _pad_stack(clouds, num_frames_total, fidx)
    ground, gmask = _pad_stack(grounds, num_frames_total, fidx)
    valid = np.zeros((num_frames_total,), np.float32)
    valid[fidx] = 1.0
    return {
        "points": points,
        "mask": mask,
        "ground": ground,
        "gmask": gmask,
        "valid": valid,
    }
