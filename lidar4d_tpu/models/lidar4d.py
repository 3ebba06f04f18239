"""LiDAR4D composed neural field: 4D hash + planes + flow + MLP heads.

TPU-native re-design of the reference's `LiDAR4D` model
(`model/lidar4d.py:22-237`). Differences from the CUDA original are purely
architectural-idiomatic, the math is preserved:

* one pure function per query (`density`, `attribute`, `flow`) over an
  explicit parameter pytree — jit/vmap/shard_map compose directly;
* the per-frame Python conditionals around temporal neighbors
  (lidar4d.py:157-173) become `jnp.where` masks on a traced frame index, so a
  single compiled graph serves every time step;
* tiny-cuda-nn FullyFusedMLPs become bias-free bf16 matmul chains (MXU);
* the no_grad on warped hash lookups (lidar4d.py:160,169) becomes
  `lax.stop_gradient`;
* the frequency view encoding (tcnn "Frequency", degree 12,
  lidar4d.py:68-74) is inlined sin/cos.

Temporal aggregation: dynamic features at t are fused with flow-warped
neighbor features at t±1 with weights 0.5/0.25/0.25 (lidar4d.py:175-176).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from lidar4d_tpu.models.flow_field import FlowField
from lidar4d_tpu.models.hash_field import HashGrid4D
from lidar4d_tpu.models.planes_field import Planes4D
from lidar4d_tpu.models.unet import UNet
from lidar4d_tpu.ops.mlp import apply_mlp, init_mlp
from lidar4d_tpu.ops.trunc_exp import trunc_exp


def frequency_encode(x, degree=12):
    """tcnn 'Frequency' encoding: sin/cos of 2^k * pi * x per dim -> [N, d*degree*2]."""
    outs = []
    for k in range(degree):
        s = (2.0 ** k) * jnp.pi
        outs.append(jnp.sin(s * x))
        outs.append(jnp.cos(s * x))
    return jnp.concatenate(outs, axis=-1)


@dataclass(frozen=True)
class LiDAR4DConfig:
    min_resolution: int = 32
    base_resolution: int = 512
    max_resolution: int = 32768
    time_resolution: int = 8
    n_levels_plane: int = 4
    n_features_per_level_plane: int = 8
    # hash-compress the static planes of the top k multiscale entries
    # (Planes4D.hash_scales — the dense one-hot bilinear contraction costs
    # ~C*H*W MACs/sample; PERF.md r4)
    plane_hash_scales: int = 0
    plane_hash_log2: int = 11
    n_levels_hash: int = 8
    n_features_per_level_hash: int = 4
    log2_hashmap_size: int = 19
    hash_size_dynamic: tuple = (15, 13, 13)  # xy/xz/yz time-grid log2 sizes
    num_layers_flow: int = 3
    hidden_dim_flow: int = 64
    # flow-field grid (FlowField defaults = reference flow_field.py:66-77)
    flow_n_levels: int = 8
    flow_n_features: int = 8
    flow_log2_hashmap_size: int = 18
    flow_base_resolution: int = 32
    flow_max_resolution: int = 8192
    num_layers_sigma: int = 2
    hidden_dim_sigma: int = 64
    geo_feat_dim: int = 15
    num_layers_lidar: int = 3
    hidden_dim_lidar: int = 64
    out_lidar_dim: int = 2
    num_frames: int = 51
    bound: float = 1.0
    view_degree: int = 12
    # renderer knobs (LiDAR_Renderer ctor, renderer.py:13-32)
    near_lidar: float = 0.01
    far_lidar: float = 0.81
    density_scale: float = 1.0
    active_sensor: bool = False
    flow_warp: bool = True  # temporal neighbor aggregation on/off
    # Density-query memory policy (models/renderer.py): chunk + rematerialize
    # is REQUIRED for gather-path fields (2^19-row tables: XLA materializes
    # every gather as a 16-32x tile-padded [idx, F<128] residual, ~50 GB
    # unrematerialized). One-hot/Pallas fields (custom_vjp residuals = the
    # query points only) are cheaper recomputed never: remat would re-run the
    # whole forward — including the stop-gradient neighbor encodes — inside
    # the backward. Flagship configs set remat_density=False, density_chunk=0.
    remat_density: bool = True
    density_chunk: int = 32768


@dataclass(frozen=True)
class LiDAR4DField:
    cfg: LiDAR4DConfig = LiDAR4DConfig()

    @property
    def planes_encoder(self) -> Planes4D:
        c = self.cfg
        return Planes4D(
            output_dim=c.n_features_per_level_plane,
            resolution=(c.min_resolution,) * 3 + (c.time_resolution,),
            multiscale_res=tuple(2 ** n for n in range(c.n_levels_plane)),
            hash_scales=c.plane_hash_scales,
            hash_log2=c.plane_hash_log2,
        )

    @property
    def hash_encoder(self) -> HashGrid4D:
        c = self.cfg
        return HashGrid4D(
            base_resolution=c.base_resolution,
            max_resolution=c.max_resolution,
            time_resolution=c.time_resolution,
            n_levels=c.n_levels_hash,
            n_features_per_level=c.n_features_per_level_hash,
            log2_hashmap_size=c.log2_hashmap_size,
            hash_size_dynamic=tuple(c.hash_size_dynamic),
        )

    @property
    def flow_net(self) -> FlowField:
        c = self.cfg
        return FlowField(
            input_dim=4,
            num_layers=c.num_layers_flow,
            hidden_dim=c.hidden_dim_flow,
            use_grid=True,
            n_levels=c.flow_n_levels,
            n_features_per_level=c.flow_n_features,
            log2_hashmap_size=c.flow_log2_hashmap_size,
            base_resolution=c.flow_base_resolution,
            max_resolution=c.flow_max_resolution,
        )

    @property
    def unet(self) -> UNet:
        return UNet(in_channels=3, out_channels=1)

    @property
    def sigma_input_dim(self) -> int:
        return self.planes_encoder.n_output_dims + self.hash_encoder.n_output_dims

    @property
    def view_dim(self) -> int:
        return 3 * self.cfg.view_degree * 2

    def init(self, key):
        c = self.cfg
        ks = jax.random.split(key, 7)
        lidar_in = self.view_dim + c.geo_feat_dim
        return {
            "planes": self.planes_encoder.init(ks[0]),
            "hash": self.hash_encoder.init(ks[1]),
            "flow": self.flow_net.init(ks[2]),
            "sigma": init_mlp(
                ks[3],
                [self.sigma_input_dim]
                + [c.hidden_dim_sigma] * (c.num_layers_sigma - 1)
                + [1 + c.geo_feat_dim],
            ),
            "intensity": init_mlp(
                ks[4],
                [lidar_in] + [c.hidden_dim_lidar] * (c.num_layers_lidar - 1) + [1],
            ),
            "raydrop": init_mlp(
                ks[5],
                [lidar_in] + [c.hidden_dim_lidar] * (c.num_layers_lidar - 1) + [1],
            ),
            "unet": self.unet.init(ks[6]),
        }

    # ------------------------------------------------------------------ flow
    def flow(self, params, x, t):
        """x: [N, 3] in [-bound, bound]; t: traced scalar.

        Returns dict(forward [N,3], backward [N,3]) — lidar4d.py:124-137.
        """
        c = self.cfg
        x01 = (x + c.bound) / (2 * c.bound)
        out = self.flow_net(params["flow"], x01, t)
        return {"forward": out[:, :3], "backward": out[:, 3:]}

    # --------------------------------------------------------------- density
    def density(self, params, x, t):
        """x: [N, 3] in [-bound, bound]; t traced scalar in [0, 1].

        Returns dict(sigma [N], geo_feat [N, geo_feat_dim]).
        Parity: lidar4d.py:139-188 with where-masked neighbor branches.
        """
        c = self.cfg
        x01 = (x + c.bound) / (2 * c.bound)
        t = jnp.asarray(t, jnp.float32)
        # int(t * (num_frames-1)) in the reference; training times are exactly
        # frame-aligned so round-to-nearest is the fp32-robust equivalent
        frame_idx = jnp.floor(t * (c.num_frames - 1) + 0.5).astype(jnp.int32)

        hash_s = self.hash_encoder.forward_static(params["hash"], x01)

        plane_s = self.planes_encoder.forward_static(
            params["planes"],
            jnp.concatenate(
                [x01, jnp.full((x01.shape[0], 1), t, x01.dtype)], axis=-1
            ),
        )

        if c.flow_warp:
            flow = self.flow_net(params["flow"], x01, t)

            # neighbor times: the reference's /num_frames quirk
            # (lidar4d.py:157-173); t2 enters clamped like the original call
            t1 = (frame_idx.astype(jnp.float32) + 1.0) / c.num_frames
            t2 = jnp.clip(
                (frame_idx.astype(jnp.float32) - 1.0) / c.num_frames, 0.0, 1.0
            )
            x1 = x01 + flow[:, :3]
            x2 = x01 + flow[:, 3:]
            xs = jnp.stack([x01, x1, x2])
            ts = jnp.stack([t, t1, t2])

            # fused 3-variant sweeps: variant 0 differentiable, warped
            # neighbors no_grad (reference lidar4d.py:160,169) — ONE pallas
            # grid per plane instead of three (hash), one batched dot_general
            # per scale instead of three (planes)
            hd = self.hash_encoder.forward_dynamic_multi(
                params["hash"], xs, ts
            )
            hash_d, hash_d1, hash_d2 = hd[0], hd[1], hd[2]
            # coord_grad_lead=1: variant 0's coordinate grads die at the ray
            # geometry; the warped variants keep theirs (the flow net's only
            # grad path through planes — reference lidar4d.py:161-173)
            pd = self.planes_encoder.forward_dynamic_scalar_t_multi(
                params["planes"], xs, ts, coord_grad_lead=1
            )
            plane_d, plane_d1, plane_d2 = pd[0], pd[1], pd[2]

            has_next = (frame_idx < c.num_frames - 1).astype(jnp.float32)
            has_prev = (frame_idx > 0).astype(jnp.float32)
            hash_d1 = has_next * hash_d1 + (1.0 - has_next) * hash_d
            plane_d1 = has_next * plane_d1 + (1.0 - has_next) * plane_d
            hash_d2 = has_prev * hash_d2 + (1.0 - has_prev) * hash_d
            plane_d2 = has_prev * plane_d2 + (1.0 - has_prev) * plane_d

            plane_d = 0.5 * plane_d + 0.25 * (plane_d1 + plane_d2)
            hash_d = 0.5 * hash_d + 0.25 * (hash_d1 + hash_d2)
        else:
            hash_d = self.hash_encoder.forward_dynamic(params["hash"], x01, t)
            # all samples share the scalar t -> time-collapsed dynamic planes
            # (exact bilinear semantics, one-hot matmul form; planes_field.py)
            plane_d = self.planes_encoder.forward_dynamic_scalar_t(
                params["planes"], x01, t
            )

        features = jnp.concatenate([plane_s, plane_d, hash_s, hash_d], axis=-1)
        h = apply_mlp(params["sigma"], features)
        sigma = trunc_exp(h[:, 0])
        return {"sigma": sigma, "geo_feat": h[:, 1:]}

    # ------------------------------------------------------------- attribute
    def attribute(self, params, d, geo_feat):
        """d: [N, 3] ray dirs in [-1, 1]; geo_feat [N, G].

        Returns [N, 2] = (raydrop, intensity) after sigmoid
        (lidar4d.py:191-223; masking is applied by the renderer).
        """
        d01 = (d + 1.0) / 2.0
        enc = frequency_encode(d01, self.cfg.view_degree)
        h = jnp.concatenate([enc, geo_feat], axis=-1)
        intensity = jax.nn.sigmoid(apply_mlp(params["intensity"], h)[:, 0])
        raydrop = jax.nn.sigmoid(apply_mlp(params["raydrop"], h)[:, 0])
        return jnp.stack([raydrop, intensity], axis=-1)

    # ------------------------------------------------ optimizer group labels
    def param_group_labels(self, params):
        """Pytree of labels mirroring get_params' per-module LRs
        (lidar4d.py:226-237): encoders at lr, heads + flow at 0.1*lr."""
        return {
            "planes": jax.tree.map(lambda _: "base", params["planes"]),
            "hash": jax.tree.map(lambda _: "base", params["hash"]),
            "flow": jax.tree.map(lambda _: "head", params["flow"]),
            "sigma": jax.tree.map(lambda _: "head", params["sigma"]),
            "intensity": jax.tree.map(lambda _: "head", params["intensity"]),
            "raydrop": jax.tree.map(lambda _: "head", params["raydrop"]),
            "unet": jax.tree.map(lambda _: "unet", params["unet"]),
        }
