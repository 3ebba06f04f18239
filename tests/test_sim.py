"""Simulator ray construction + trajectory edits.

Golden parity: the novel-ray builder and the trajectory-shift loop are
checked against a torch transcription of the reference math
(main_lidar4d_sim.py:137-164 ray grid, :249-272 shift/align loop), the same
pattern as tests/test_reference_parity.py; plus a full Simulator.render
smoke test on a one-hot field.
"""

import numpy as np
import pytest

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


def _random_rigid_poses(n, seed=0):
    rng = np.random.default_rng(seed)
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        poses[i, :3, :3] = q.astype(np.float32)
        poses[i, :3, 3] = rng.normal(size=3).astype(np.float32)
    return poses


def _reference_novel_rays(poses_np, H, W, fov_lidar):
    """Torch transcription of the reference ray grid
    (main_lidar4d_sim.py:137-164)."""
    torch = pytest.importorskip("torch")
    poses = torch.from_numpy(poses_np).float()
    B = poses.shape[0]
    i, j = torch.meshgrid(
        torch.linspace(0, W - 1, W), torch.linspace(0, H - 1, H),
        indexing="ij",
    )
    i = i.t().reshape([1, H * W]).expand([B, H * W])
    j = j.t().reshape([1, H * W]).expand([B, H * W])
    fov_up, fov = fov_lidar
    beta = -(i - W / 2) / W * 2 * np.pi
    alpha = (fov_up - j / H * fov) / 180 * np.pi
    directions = torch.stack(
        [torch.cos(alpha) * torch.cos(beta),
         torch.cos(alpha) * torch.sin(beta),
         torch.sin(alpha)], -1)
    rays_d = directions @ poses[:, :3, :3].transpose(-1, -2)
    rays_o = poses[..., :3, 3]
    rays_o = rays_o[..., None, :].expand_as(rays_d)
    return rays_o.numpy(), rays_d.numpy()


@pytest.mark.parametrize("H,W,fov", [
    (66, 1030, (2.0, 26.9)),      # KITTI-360 native grid
    (32, 1024, (10.0, 40.0)),     # kitti2nus preset grid
    (11, 37, (5.0, 20.0)),        # odd novel config
])
def test_build_novel_rays_golden_vs_reference(H, W, fov):
    poses = _random_rigid_poses(3, seed=H)
    want_o, want_d = _reference_novel_rays(poses, H, W, fov)
    got_o, got_d = build_novel_rays(poses, H, W, fov)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_o, want_o, rtol=1e-6, atol=1e-7)


def _reference_shift(rays_o_np, shift_xyz, scale, align_axis):
    """Torch transcription of the reference trajectory-shift loop
    (main_lidar4d_sim.py:249-272)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rays_o = torch.from_numpy(rays_o_np).float()
    rays_o_shift = rays_o.clone()
    opt_x, opt_y, opt_z = shift_xyz
    shift_x, shift_y, shift_z = opt_x, opt_y, opt_z
    forward = torch.tensor([[1.0, 0, 0]]).to(rays_o)
    for i in range(rays_o.shape[0]):
        if align_axis:
            if i < rays_o.shape[0] - 1:
                forward = F.normalize(
                    (rays_o[i + 1, 0, :] - rays_o[i, 0, :]).unsqueeze(0), p=2
                )
            left = torch.tensor(
                [-forward[:, 1], forward[:, 0], forward[:, 2]]).to(forward)
            shift_x = (opt_x * forward + opt_y * left)[:, 0]
            shift_y = (opt_x * forward + opt_y * left)[:, 1]
        rays_o_shift[i, :, 0] = rays_o_shift[i, :, 0] + shift_x * scale
        rays_o_shift[i, :, 1] = rays_o_shift[i, :, 1] + shift_y * scale
        rays_o_shift[i, :, 2] = rays_o_shift[i, :, 2] + shift_z * scale
    return rays_o_shift.numpy()


@pytest.mark.parametrize("align_axis", [False, True])
def test_shift_trajectory_golden_vs_reference(align_axis):
    # a curving trajectory so align_axis exercises changing motion directions
    n = 7
    t = np.linspace(0, 1, n, dtype=np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    poses[:, 0, 3] = np.cos(t * 2.0) * 3.0
    poses[:, 1, 3] = np.sin(t * 2.0) * 3.0
    poses[:, 2, 3] = t * 0.3
    rays_o, _ = build_novel_rays(poses, 2, 4, (2.0, 26.9))

    shift, scale = (1.5, -0.7, 0.25), 0.01
    want = _reference_shift(rays_o, shift, scale, align_axis)
    got = shift_trajectory(rays_o, *shift, scale, align_axis=align_axis)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_kitti2nus_preset_matches_reference():
    """main_lidar4d_sim.py:184-190 preset values, incl. the z-lift compose
    with a pre-existing --shift_z."""
    from types import SimpleNamespace

    from lidar4d_tpu.cli.main_lidar4d_sim import apply_kitti2nus_preset

    opt = SimpleNamespace(fov_lidar=[2.0, 26.9], H_lidar=66, W_lidar=1030,
                          far_lidar=81.0, shift_z=0.5, scale=0.01,
                          use_refine=True)
    apply_kitti2nus_preset(opt)
    assert opt.fov_lidar == [10.0, 40.0]
    assert (opt.H_lidar, opt.W_lidar) == (32, 1024)
    assert opt.far_lidar == 70
    assert opt.use_refine is False
    np.testing.assert_allclose(opt.shift_z, 0.5 + 0.1 * 0.01)


def test_simulator_render_smoke(tmp_path):
    """Simulator.render end-to-end on a tiny one-hot field: point clouds on
    disk with back-projection consistent with ops.pano."""
    from types import SimpleNamespace

    import jax

    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
    from lidar4d_tpu.sim.simulator import Simulator

    cfg = LiDAR4DConfig(
        n_levels_hash=2, n_features_per_level_hash=4, log2_hashmap_size=8,
        base_resolution=8, max_resolution=16, n_levels_plane=2,
        min_resolution=8, flow_n_levels=2, flow_log2_hashmap_size=8,
        flow_base_resolution=8, flow_max_resolution=16,
        near_lidar=0.01, far_lidar=0.81, num_frames=4,
        remat_density=False, density_chunk=0,
    )
    field = LiDAR4DField(cfg)
    params = field.init(jax.random.PRNGKey(0))

    H, W = 8, 16
    opt = SimpleNamespace(num_steps=16, num_coarse=0, num_fine=0,
                          scale=0.01, fov_lidar=(2.0, 26.9))
    poses = _random_rigid_poses(2, seed=7)
    poses[:, :3, 3] *= 0.05  # keep origins inside the bound
    rays_o, rays_d = build_novel_rays(poses, H, W, opt.fov_lidar)
    times = np.array([0.0, 0.5], np.float32)

    sim = Simulator("lidar4d", opt, field, params,
                    workspace=str(tmp_path), use_refine=False,
                    H_lidar=H, W_lidar=W)
    pc = sim.render(rays_o, rays_d, times, save_video=False)

    import os

    pts_dir = os.path.join(str(tmp_path), "points")
    files = sorted(os.listdir(pts_dir))
    assert files == ["lidar4d_0000.npy", "lidar4d_0001.npy"]
    last = np.load(os.path.join(pts_dir, files[-1]))
    np.testing.assert_allclose(last, pc)
    assert last.ndim == 2 and last.shape[1] == 4  # xyz + intensity
    assert np.isfinite(last).all()


def test_render_frames_staged_matches_per_frame():
    """The batched trajectory render must equal per-frame render_staged
    (same chunks, per-chunk scalar time) for every frame/time."""
    import jax
    import jax.numpy as jnp

    from lidar4d_tpu.models.lidar4d import LiDAR4DConfig, LiDAR4DField
    from lidar4d_tpu.models.renderer import render_frames_staged, render_staged

    cfg = LiDAR4DConfig(
        n_levels_hash=2, n_features_per_level_hash=4, log2_hashmap_size=8,
        base_resolution=8, max_resolution=16, n_levels_plane=2,
        min_resolution=8, flow_n_levels=2, flow_log2_hashmap_size=8,
        flow_base_resolution=8, flow_max_resolution=16,
        near_lidar=0.01, far_lidar=0.81, num_frames=4,
        remat_density=False, density_chunk=0,
    )
    field = LiDAR4DField(cfg)
    params = field.init(jax.random.PRNGKey(0))

    H, W = 6, 20
    poses = _random_rigid_poses(3, seed=11)
    poses[:, :3, 3] *= 0.05
    rays_o, rays_d = build_novel_rays(poses, H, W, (2.0, 26.9))
    times = np.array([0.0, 0.4, 1.0], np.float32)

    # chunk 64 -> H*W=120 pads to 2 chunks/frame (exercises the pad path)
    batched = render_frames_staged(
        field, params, jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.asarray(times), num_steps=16, chunk=64,
    )
    for i in range(3):
        ref = render_staged(
            field, params, jnp.asarray(rays_o[i]), jnp.asarray(rays_d[i]),
            jnp.float32(times[i]), num_steps=16, chunk=64,
        )
        np.testing.assert_allclose(
            np.asarray(batched["depth_lidar"][i]),
            np.asarray(ref["depth_lidar"]), rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(batched["image_lidar"][i]),
            np.asarray(ref["image_lidar"]), rtol=2e-5, atol=2e-6)
