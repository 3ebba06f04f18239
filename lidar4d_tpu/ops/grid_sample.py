"""Bilinear grid sampling (pure JAX, TPU-friendly gathers).

Equivalent to the reference's `grid_sample_wrapper` (`model/planes_field.py:56-84`)
which calls torch `F.grid_sample(mode='bilinear', padding_mode='border',
align_corners=True)` on coordinates mapped from [0,1] to [-1,1].

We skip the [-1,1] round-trip: `grid_sample_2d` takes coordinates directly in
[0,1] and maps them to pixel centers with the align_corners=True convention
(`u = x * (W - 1)`), clamping to the border. The gather is a single flat
`take` of C-channel rows — XLA lowers this to an efficient TPU gather.
"""

import jax.numpy as jnp


def bilinear_corners(H, W, coords):
    """Corner flat indices + bilinear weights (align_corners=True, border clamp).

    Args:
      coords: [N, 2] in [0, 1]; coords[:, 0] indexes W, coords[:, 1] indexes H.
    Returns:
      idx [4, N] int32 flat row-major indices, wgt [4, N] float32 — corner
      order (y0x0, y0x1, y1x0, y1x1).
    """
    x = jnp.clip(coords[:, 0], 0.0, 1.0) * (W - 1)
    y = jnp.clip(coords[:, 1], 0.0, 1.0) * (H - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    idx = jnp.stack([y0i * W + x0i, y0i * W + x1i, y1i * W + x0i, y1i * W + x1i])
    wgt = jnp.stack([(1 - tx) * (1 - ty), tx * (1 - ty), (1 - tx) * ty, tx * ty])
    return idx, wgt


def grid_sample_2d(grid, coords):
    """Sample a 2D feature grid bilinearly.

    Args:
      grid:   [C, H, W] features. Axis -1 (W) is indexed by coords[..., 0],
              axis -2 (H) by coords[..., 1] (torch grid_sample convention where
              the grid passed in is [C, reso[d2], reso[d1]] for coord (d1, d2)).
      coords: [N, 2] in [0, 1].

    Returns:
      [N, C] interpolated features.
    """
    C, H, W = grid.shape
    idx, wgt = bilinear_corners(H, W, coords)
    flat = grid.reshape(C, H * W)
    g = jnp.take(flat, idx.reshape(-1), axis=1).reshape(C, 4, -1)
    return jnp.sum(g * wgt[None], axis=1).T
