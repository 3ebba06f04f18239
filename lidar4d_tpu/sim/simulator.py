"""Novel space-time LiDAR simulator.

Re-design of the reference's `Simulator` (`model/simulator.py:22-232`) +
`main_lidar4d_sim.py` ray construction: renders trained fields along novel
trajectories with arbitrary sensor configs (fov / H / W), optional U-Net
refinement, and writes per-frame point clouds (.npy), image panels (.png)
and an .mp4.

The per-frame loop stays on the host (it writes files); each frame's render
is the fully jitted staged renderer.
"""

import os

import jax.numpy as jnp
import numpy as np

from lidar4d_tpu.ops.pano import pano_to_lidar_with_intensities
from lidar4d_tpu.ops.rays import pano_ray_directions


def build_novel_rays(poses, H, W, fov_lidar):
    """Full-frame ray grids for a stack of poses ([B,4,4]) at a novel sensor
    config (main_lidar4d_sim.py:137-164). Returns rays_o, rays_d [B, H*W, 3]."""
    j, i = np.meshgrid(np.arange(H, dtype=np.float32),
                       np.arange(W, dtype=np.float32), indexing="ij")
    dirs = np.asarray(
        pano_ray_directions(i.reshape(-1), j.reshape(-1), H, W, *fov_lidar)
    )  # [H*W, 3]
    rays_d = np.einsum("nk,bjk->bnj", dirs, poses[:, :3, :3])
    rays_o = np.broadcast_to(poses[:, None, :3, 3], rays_d.shape).copy()
    return rays_o, rays_d


def shift_trajectory(rays_o, shift_x, shift_y, shift_z, scale, align_axis=False):
    """Translate ray origins, optionally aligning x to the motion direction
    (main_lidar4d_sim.py:249-272)."""
    out = rays_o.copy()
    forward = np.array([1.0, 0.0, 0.0])
    B = rays_o.shape[0]
    for i in range(B):
        sx, sy = shift_x, shift_y
        if align_axis:
            if i < B - 1:
                delta = rays_o[i + 1, 0] - rays_o[i, 0]
                n = np.linalg.norm(delta)
                if n > 1e-9:
                    forward = delta / n
            left = np.array([-forward[1], forward[0], forward[2]])
            v = shift_x * forward + shift_y * left
            sx, sy = v[0], v[1]
        out[i, :, 0] += sx * scale
        out[i, :, 1] += sy * scale
        out[i, :, 2] += shift_z * scale
    return out


class Simulator:
    def __init__(
        self,
        name,
        opt,
        field,
        params,
        workspace="simulation",
        use_refine=True,
        H_lidar=66,
        W_lidar=1030,
    ):
        self.name = name
        self.opt = opt
        self.field = field
        self.params = params
        self.workspace = workspace
        self.use_refine = use_refine
        self.H_lidar, self.W_lidar = H_lidar, W_lidar
        os.makedirs(workspace, exist_ok=True)

    def _refine(self, raydrop, intensity, depth):
        x = jnp.stack(
            [jnp.asarray(raydrop), jnp.asarray(intensity), jnp.asarray(depth)]
        )[None]
        out, _ = self.field.unet.apply(
            {
                "params": self.params["unet"]["params"],
                "state": self.params["unet"]["state"],
            },
            x,
            train=False,
        )
        return np.asarray(out[0, 0])

    def render(self, rays_o, rays_d, times, save_pc=True, save_img=True,
               save_video=True, mesh=None, frame_batch=8):
        """rays_o/rays_d: [B, H*W, 3]; times: [B] in [0,1].

        `mesh`: optional data mesh — shards each frame's rays over the
        devices (params must be replicated on it); frame renders then scale
        linearly over chips, the path to interactive novel-view rates.

        One-hot fields render `frame_batch` frames per dispatch through
        render_frames_staged — one compiled executable sweeps the whole
        trajectory with no host round-trips between frames (the per-frame
        python loop below only does file I/O). `frame_batch` bounds device
        output memory; 8 frames of 66x1030 outputs is ~6.5 MB.
        """
        # gather-path fields render through the host chunk loop: the lax.map
        # composite over gather-path chunks faults the TPU worker (r4
        # diagnosis, models/renderer.py::render_staged_host)
        from lidar4d_tpu.models.renderer import render_frames_staged
        from lidar4d_tpu.ops.hash_onehot import FACT_MAX_ROWS, onehot_eligible

        enc = self.field.hash_encoder
        specs = [enc.static_spec] + [enc.dynamic_spec(p) for p in range(3)]
        onehot = all(onehot_eligible(s, FACT_MAX_ROWS) for s in specs)

        H, W = self.H_lidar, self.W_lidar
        b_total = rays_o.shape[0]
        depths = np.empty((b_total, H * W), np.float32)
        images = np.empty((b_total, H * W, 2), np.float32)
        if onehot:
            # pad the trailing partial batch by repeating the last frame so
            # every dispatch reuses the one compiled executable
            for s in range(0, b_total, frame_batch):
                idx = np.arange(s, s + frame_batch) % b_total
                out = render_frames_staged(
                    self.field, self.params,
                    jnp.asarray(rays_o[idx]), jnp.asarray(rays_d[idx]),
                    jnp.asarray(np.asarray(times, np.float32)[idx]),
                    num_steps=self.opt.num_steps,
                    num_coarse=getattr(self.opt, "num_coarse", 0),
                    num_fine=getattr(self.opt, "num_fine", 0),
                    mesh=mesh,
                )
                keep = min(frame_batch, b_total - s)
                depths[s:s + keep] = np.asarray(out["depth_lidar"])[:keep]
                images[s:s + keep] = np.asarray(out["image_lidar"])[:keep]
        else:
            from lidar4d_tpu.models.renderer import render_staged_host

            for i in range(b_total):
                out = render_staged_host(
                    self.field, self.params,
                    jnp.asarray(rays_o[i]), jnp.asarray(rays_d[i]),
                    jnp.float32(times[i]), num_steps=self.opt.num_steps,
                    num_coarse=getattr(self.opt, "num_coarse", 0),
                    num_fine=getattr(self.opt, "num_fine", 0),
                )
                depths[i] = np.asarray(out["depth_lidar"])
                images[i] = np.asarray(out["image_lidar"])

        frames = []
        pred_lidar = None
        for i in range(b_total):
            raydrop = images[i, :, 0].reshape(H, W)
            intensity = images[i, :, 1].reshape(H, W)
            depth = depths[i].reshape(H, W)
            if self.use_refine:
                raydrop = self._refine(raydrop, intensity, depth)
            mask = (raydrop > 0.5).astype(np.float32)
            intensity = intensity * mask
            depth = depth * mask

            pred_lidar = pano_to_lidar_with_intensities(
                depth / self.opt.scale, intensity, self.opt.fov_lidar
            )
            if save_pc:
                d = os.path.join(self.workspace, "points")
                os.makedirs(d, exist_ok=True)
                np.save(os.path.join(d, f"lidar4d_{i:04d}.npy"), pred_lidar)

            panel = self._panel(raydrop, intensity, depth)
            if save_img and panel is not None:
                d = os.path.join(self.workspace, "images")
                os.makedirs(d, exist_ok=True)
                import cv2

                cv2.imwrite(os.path.join(d, f"lidar4d_{i:04d}.png"), panel)
            if save_video and panel is not None:
                import cv2

                frames.append(cv2.cvtColor(panel, cv2.COLOR_BGR2RGB))

        if save_video and frames:
            try:
                import imageio

                d = os.path.join(self.workspace, "video")
                os.makedirs(d, exist_ok=True)
                imageio.mimwrite(
                    os.path.join(d, "lidar4d_sim.mp4"),
                    np.stack(frames), fps=5, quality=8, macro_block_size=1,
                )
            except Exception as e:  # video writing is best-effort
                print(f"[WARN] video write failed: {e}")
        return pred_lidar

    def _panel(self, raydrop, intensity, depth):
        try:
            import cv2
        except ImportError:
            return None
        img_raydrop = cv2.cvtColor(
            (np.clip(raydrop, 0, 1) * 255).astype(np.uint8), cv2.COLOR_GRAY2BGR
        )
        img_intensity = cv2.applyColorMap(
            (np.clip(intensity, 0, 1) * 255).astype(np.uint8), 1
        )
        img_depth = cv2.applyColorMap(
            (np.clip(depth, 0, 1) * 255).astype(np.uint8), 20
        )
        return cv2.vconcat([img_raydrop, img_intensity, img_depth])
