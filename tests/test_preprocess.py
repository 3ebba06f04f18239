"""Preprocessing pipeline round-trip on fake raw KITTI-360 data.

Builds a miniature KITTI-360 directory tree (poses.txt, calibration files,
velodyne .bin scans), runs the three preprocessing stages
(generate_rangeview -> kitti360_to_nerf -> cal_seq_config; parity with the
reference's preprocess_data.sh), and loads the result through
KITTI360Dataset.
"""

import json
import os

import numpy as np
import pytest

from lidar4d_tpu.data.preprocess import (
    KITTI360Loader,
    cal_seq_config,
    generate_rangeview,
    kitti360_to_nerf,
)

SEQ = "1538"  # static sequence: frames 1538..1601


@pytest.fixture(scope="module")
def fake_kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti360_raw")
    k3 = root / "KITTI-360"
    seq = "2013_05_28_drive_0000_sync"
    (k3 / "calibration").mkdir(parents=True)
    (k3 / "data_poses" / seq).mkdir(parents=True)
    lidar_dir = k3 / "data_3d_raw" / seq / "velodyne_points" / "data"
    lidar_dir.mkdir(parents=True)

    rng = np.random.default_rng(0)
    # calibration: cam00->pose (imu) and cam00->velo
    cam_to_pose = np.hstack([np.eye(3), np.array([[0.8], [0.3], [-0.1]])])
    with open(k3 / "calibration" / "calib_cam_to_pose.txt", "w") as f:
        f.write("image_00: " + " ".join(str(v) for v in cam_to_pose.reshape(-1)) + "\n")
        f.write("image_01: " + " ".join(str(v) for v in cam_to_pose.reshape(-1)) + "\n")
    cam_to_velo = np.hstack([np.eye(3), np.array([[0.3], [0.0], [0.2]])])
    with open(k3 / "calibration" / "calib_cam_to_velo.txt", "w") as f:
        f.write(" ".join(str(v) for v in cam_to_velo.reshape(-1)) + "\n")

    # poses.txt: frame id + 3x4 imu->world, with a GAP to test forward-fill
    start, end = 1538, 1601
    lines = []
    for fid in range(start, end + 1):
        if fid in (1550, 1551):  # missing frames
            continue
        pose = np.hstack([np.eye(3), np.array([[0.5 * (fid - start)], [0.0], [0.0]])])
        lines.append(np.concatenate([[fid], pose.reshape(-1)]))
    np.savetxt(k3 / "data_poses" / seq / "poses.txt", np.stack(lines))

    # velodyne scans: ring of points at varying ranges + intensity
    for fid in range(start, end + 1):
        n = 3000
        az = rng.uniform(-np.pi, np.pi, n)
        el = rng.uniform(np.radians(-24.9), np.radians(2.0), n)
        r = rng.uniform(3, 60, n)
        pts = np.zeros((n, 4), np.float32)
        pts[:, 0] = r * np.cos(el) * np.cos(az)
        pts[:, 1] = r * np.cos(el) * np.sin(az)
        pts[:, 2] = r * np.sin(el)
        pts[:, 3] = rng.uniform(0, 1, n)
        pts.tofile(lidar_dir / f"{fid:010d}.bin")
    return str(root)


def test_loader_pose_chain_and_forward_fill(fake_kitti_root):
    k3 = KITTI360Loader(os.path.join(fake_kitti_root, "KITTI-360"))
    poses = k3.load_lidars("2013_05_28_drive_0000", list(range(1538, 1602)))
    assert poses.shape == (64, 4, 4)
    # missing frames 1550/1551 forward-filled from 1549
    np.testing.assert_array_equal(poses[1550 - 1538], poses[1549 - 1538])
    np.testing.assert_array_equal(poses[1551 - 1538], poses[1549 - 1538])
    assert not np.allclose(poses[0], poses[10])
    # velo->world = imu->world @ cam->imu @ inv(cam->velo); translation moves in x
    assert poses[10][0, 3] > poses[0][0, 3]


def test_full_preprocess_roundtrip(fake_kitti_root, tmp_path):
    H, W = 22, 103
    generate_rangeview(fake_kitti_root, SEQ, H=H, W=W)
    rv = np.load(os.path.join(fake_kitti_root, "train", "0000001538.npy"))
    assert rv.shape == (H, W, 3)
    assert (rv[..., 2] > 0).any()

    kitti360_to_nerf(fake_kitti_root, SEQ)
    with open(os.path.join(fake_kitti_root, f"transforms_{SEQ}_train.json")) as f:
        tf = json.load(f)
    assert tf["num_frames"] == 64
    assert tf["num_frames_split"] == 60  # 64 - 4 val frames

    cfg_dir = str(tmp_path / "configs")
    scale, center = cal_seq_config(fake_kitti_root, SEQ, configs_dir=cfg_dir)
    cfg = open(os.path.join(cfg_dir, f"kitti360_{SEQ}.txt")).read()
    assert f"sequence_id = {SEQ}" in cfg
    assert 0 < scale < 1

    from lidar4d_tpu.data.kitti360 import KITTI360Dataset

    ds = KITTI360Dataset(
        split="train", root_path=fake_kitti_root, sequence_id=SEQ,
        scale=scale, offset=center,
    )
    assert len(ds) == 60
    assert ds.H_lidar == H and ds.W_lidar == W
    # world-scaled poses fit in the unit box
    assert np.abs(ds.poses_lidar[:, :3, 3]).max() <= 1.0 + 1e-6
