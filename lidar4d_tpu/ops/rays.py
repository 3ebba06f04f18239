"""LiDAR panorama ray generation (jit-friendly).

Parity with the reference's `get_lidar_rays` (`data/base_dataset.py:16-102`):
azimuth beta = -(i - W/2)/W * 2pi, elevation alpha = (fov_up - j/H * fov) deg,
directions rotated by the pose rotation, origins at the pose translation.
Supports full-image rays, uniform random ray sampling, and overlapped patch
sampling (random top-left + meshgrid offsets, wrapped in W) — all with static
output shapes so one compiled graph serves every frame.
"""

import jax
import jax.numpy as jnp
import numpy as np


def pano_ray_directions(i, j, H, W, fov_up, fov):
    """Sensor-frame unit-ish directions for pano pixel coords (i=col, j=row)."""
    beta = -(i - W / 2) / W * 2 * np.pi
    alpha = (fov_up - j / H * fov) / 180 * np.pi
    return jnp.stack(
        [
            jnp.cos(alpha) * jnp.cos(beta),
            jnp.cos(alpha) * jnp.sin(beta),
            jnp.sin(alpha),
        ],
        axis=-1,
    )


def _all_pixel_coords(H, W):
    # torch meshgrid(linspace(W), linspace(H), 'ij').t() == row-major (j, i) scan
    j, i = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                        jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return i.reshape(-1), j.reshape(-1)


def get_lidar_rays(pose, intrinsics, H, W, key=None, N=-1, patch_size=1):
    """Generate rays for one pano frame.

    Args:
      pose:       [4, 4] lidar2world (already offset/scaled).
      intrinsics: (fov_up, fov) degrees.
      H, W:       pano dims (static).
      key:        PRNG key (required when N > 0).
      N:          number of rays; -1 = all pixels.
      patch_size: int or (px, py); > 1 switches to overlapped patch sampling.

    Returns:
      dict(rays_o [N,3], rays_d [N,3], inds [N] int32)
    """
    fov_up, fov = intrinsics

    if isinstance(patch_size, int):
        px, py = patch_size, patch_size
    elif len(patch_size) == 1:
        px, py = patch_size[0], patch_size[0]
    else:
        px, py = patch_size

    if N > 0:
        N = min(N, H * W)
        if px > 1:
            # overlapped patch sampling (base_dataset.py:48-67): random
            # top-left per patch, row clipped to fit, col wrapped mod W
            num_patch = N // (px * py)
            kx, ky = jax.random.split(key)
            ix = jax.random.randint(kx, (num_patch,), 0, H - px)
            iy = jax.random.randint(ky, (num_patch,), 0, W)
            pi, pj = jnp.meshgrid(jnp.arange(px), jnp.arange(py), indexing="ij")
            offsets = jnp.stack([pi.reshape(-1), pj.reshape(-1)], axis=-1)  # [p2,2]
            tl = jnp.stack([ix, iy], axis=-1)[:, None, :] + offsets[None]  # [np,p2,2]
            tl = tl.reshape(-1, 2)
            inds = tl[:, 0] * W + (tl[:, 1] % W)
        else:
            inds = jax.random.randint(key, (N,), 0, H * W)
        inds = inds.astype(jnp.int32)
        i = (inds % W).astype(jnp.float32)
        j = (inds // W).astype(jnp.float32)
    else:
        i, j = _all_pixel_coords(H, W)
        inds = jnp.arange(H * W, dtype=jnp.int32)

    directions = pano_ray_directions(i, j, H, W, fov_up, fov)  # [N, 3]
    rays_d = directions @ pose[:3, :3].T
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_d.shape)
    return {"rays_o": rays_o, "rays_d": rays_d, "inds": inds}
