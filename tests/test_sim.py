"""Simulator ray construction + trajectory edits (host-side numerics)."""

import numpy as np

from lidar4d_tpu.sim.simulator import build_novel_rays, shift_trajectory


def _poses(n=5, step=2.0):
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = step * np.arange(n)  # forward along +x
    return poses


def test_build_novel_rays_shapes_and_dirs():
    H, W = 8, 32
    poses = _poses()
    rays_o, rays_d = build_novel_rays(poses, H, W, (2.0, 26.9))
    assert rays_o.shape == (5, H * W, 3)
    assert rays_d.shape == (5, H * W, 3)
    # unit-norm directions, origins at the pose translations
    np.testing.assert_allclose(np.linalg.norm(rays_d, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(rays_o[3, 0], poses[3, :3, 3], atol=1e-6)
    # identity-pose rays match the training ray model (ops.rays)
    import jax.numpy as jnp
    from lidar4d_tpu.ops.rays import get_lidar_rays

    ref = get_lidar_rays(jnp.eye(4), (2.0, 26.9), H, W, N=-1)
    np.testing.assert_allclose(rays_d[0], np.asarray(ref["rays_d"]), atol=1e-5)


def test_shift_trajectory_plain_and_aligned():
    H, W = 2, 4
    poses = _poses()
    rays_o, _ = build_novel_rays(poses, H, W, (2.0, 26.9))
    scale = 0.01

    shifted = shift_trajectory(rays_o, 0.0, 2.0, 0.5, scale)
    np.testing.assert_allclose(shifted[:, :, 1] - rays_o[:, :, 1], 2.0 * scale,
                               atol=1e-7)
    np.testing.assert_allclose(shifted[:, :, 2] - rays_o[:, :, 2], 0.5 * scale,
                               atol=1e-7)

    # motion is +x, so an aligned lateral shift goes to +y ("left")
    aligned = shift_trajectory(rays_o, 0.0, 2.0, 0.0, scale, align_axis=True)
    np.testing.assert_allclose(aligned[:, :, 1] - rays_o[:, :, 1], 2.0 * scale,
                               atol=1e-6)
    np.testing.assert_allclose(aligned[:, :, 0], rays_o[:, :, 0], atol=1e-6)

    # kitti2nus-style z lift only
    lifted = shift_trajectory(rays_o, 0.0, 0.0, 0.1, scale)
    np.testing.assert_allclose(lifted[:, :, 2] - rays_o[:, :, 2], 0.1 * scale,
                               atol=1e-8)
