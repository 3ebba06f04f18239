"""K-Planes style factorized 4D feature planes.

TPU-native re-design of the reference's `Planes4D`
(`model/planes_field.py:144-239`): the C(4,2)=6 coordinate planes per scale
split into a static group (xy, xz, yz) and a dynamic group (xt, yt, zt);
features within a group are reduced by product and concatenated over the
multiscale pyramid. Time planes are initialized to ones, spatial planes
U(0.1, 0.5) (planes_field.py:44-53), so the product starts near the spatial
prior and time modulates it multiplicatively.

All samples are bilinear gathers (`ops.grid_sample_2d`) with the
align_corners=True / border-padding semantics the reference gets from
torch `F.grid_sample` (planes_field.py:56-84).
"""

from dataclasses import dataclass, field
from itertools import combinations

import jax
import jax.numpy as jnp

from lidar4d_tpu.ops.grid_sample import bilinear_corners, grid_sample_2d
from lidar4d_tpu.ops.hash_enc import HashEncoderSpec
from lidar4d_tpu.ops.hash_onehot import hash_encode_auto
from lidar4d_tpu.ops.plane_onehot import plane_bilinear, plane_linear

_COO_COMBS = tuple(combinations(range(4), 2))
# static: no time axis; dynamic: includes axis 3
_STATIC_COMBS = tuple(c for c in _COO_COMBS if 3 not in c)
_DYNAMIC_COMBS = tuple(c for c in _COO_COMBS if 3 in c)


@dataclass(frozen=True)
class Planes4D:
    output_dim: int = 8
    resolution: tuple = (32, 32, 32, 8)  # x, y, z, t base resolutions
    multiscale_res: tuple = (1, 2, 4, 8)
    a: float = 0.1
    b: float = 0.5
    # Hash-compress the STATIC planes of the top `hash_scales` multiscale
    # entries: a [2^hash_log2, C] spatial-hash table (NGP collision class)
    # replaces the dense [C, H, W] plane. Rationale (PERF.md r4): the dense
    # one-hot bilinear contraction costs ~C*H*W MACs PER SAMPLE — the 256^2
    # top scale alone is ~1 MFLOP/sample and the planes-static block is
    # ~22.9 ms of the ~102 ms step — while the factorized hash kernel's cost
    # is table-size-independent on the VPU side. This is within the
    # reference's own design language: its DYNAMIC field already stores 2D
    # planes hash-compressed (model/hash_field.py:44-59, sizes 2^15/2^13).
    # Time planes stay dense (1-D lookups are cheap). 0 = all dense.
    hash_scales: int = 0
    hash_log2: int = 11

    @property
    def n_output_dims(self) -> int:
        # concat over scales, x2 for (static, dynamic) groups
        return self.output_dim * len(self.multiscale_res) * 2

    def _scale_reso(self, scale: int):
        # multiscale applies to spatial axes only (planes_field.py:174-177)
        return tuple(r * scale for r in self.resolution[:3]) + self.resolution[3:]

    def _static_hashed(self, scale_idx: int, reso) -> bool:
        """Static planes of this scale use hashed storage: top `hash_scales`
        entries, cubic spatial resolution (the hash spec is isotropic), and
        only when hashing actually compresses (vertex grid > table)."""
        if scale_idx < len(self.multiscale_res) - self.hash_scales:
            return False
        if len({reso[0], reso[1], reso[2]}) != 1:
            return False
        return reso[0] ** 2 > (1 << self.hash_log2)

    def _hash_spec(self, size: int) -> HashEncoderSpec:
        # base = size - 1 gives size vertices over [0, 1] — the hash
        # encoder's corner grid matches the dense plane's align_corners
        # pixel grid exactly (ops/hash_enc.py _level_indices clips to res)
        return HashEncoderSpec(
            n_dims=2,
            n_levels=1,
            n_features=self.output_dim,
            log2_hashmap_size=self.hash_log2,
            base_resolution=size - 1,
            max_resolution=size - 1,
        )

    def init(self, key):
        params = []
        keys = jax.random.split(key, len(self.multiscale_res) * len(_COO_COMBS))
        ki = 0
        for si, scale in enumerate(self.multiscale_res):
            reso = self._scale_reso(scale)
            hashed = self._static_hashed(si, reso)
            planes = []
            for comb in _COO_COMBS:
                # stored [C, reso[c1], reso[c0]] so coord c0 indexes the last
                # axis — the reference's reversed-reso grid layout
                shape = (self.output_dim, reso[comb[1]], reso[comb[0]])
                if 3 in comb:
                    w = jnp.ones(shape, jnp.float32)
                elif hashed:
                    # hashed static plane: flat [rows, C] table, same U(a, b)
                    # init so the 3-plane product prior is unchanged
                    spec = self._hash_spec(reso[comb[0]])
                    w = jax.random.uniform(
                        keys[ki], (spec.n_rows, self.output_dim),
                        jnp.float32, self.a, self.b,
                    )
                else:
                    w = jax.random.uniform(
                        keys[ki], shape, jnp.float32, self.a, self.b
                    )
                planes.append(w)
                ki += 1
            params.append(planes)
        return params

    def _forward(self, params, pts, combs, comb_ids, coord_grad=True):
        """pts: [N, 4] in [0,1]. Product over the group's planes, concat scales.

        On TPU, all planes of a group/scale share one (H, W) shape and batch
        into ONE `plane_bilinear` one-hot MXU kernel call: both the gather
        and its scatter-add backward become matmuls (see ops/plane_onehot.py
        for the cost model). On CPU — and for exotic configs with unequal
        per-axis resolutions — the XLA gather path below is used instead:
        one take per (scale, plane), with the 4 corner lookups batched into a
        single [C, 4N] axis-1 gather (finer-grained fusion makes XLA
        materialize a [4*P*S*N, C] layout whose C-minor tile padding costs
        16x the logical size in HBM; observed 19.3 GB at N=786k).
        """
        n = pts.shape[0]
        c_dim = self.output_dim
        use_kernel = jax.default_backend() != "cpu"
        outs = []
        for si, planes in enumerate(params):  # per scale
            group = [planes[ci] for ci in comb_ids]
            if group[0].ndim == 2:
                # hashed static planes (see hash_scales): one 1-level 2D
                # hash encode per plane — factorized one-hot/gather kernels
                # on TPU, XLA gather on CPU. pts here are ray positions
                # (never learned), matching coord_grad=False below; the
                # one-hot kernels NaN-poison a coordinate cotangent, so a
                # future differentiable caller fails loudly, not silently.
                reso = self._scale_reso(self.multiscale_res[si])
                acc = None
                for comb, g in zip(combs, group):
                    spec = self._hash_spec(reso[comb[0]])
                    feat = hash_encode_auto(
                        spec, g, jnp.clip(pts[:, list(comb)], 0.0, 1.0)
                    ).T                                      # [C, N]
                    acc = feat if acc is None else acc * feat
            elif use_kernel and len({g.shape for g in group}) == 1:
                g = jnp.stack(group)                                # [P, C, H, W]
                pt = jnp.stack([pts[:, list(comb)] for comb in combs])
                feats = plane_bilinear(g, pt, coord_grad=coord_grad)  # [P, C, N]
                acc = feats[0]
                for k in range(1, len(group)):
                    acc = acc * feats[k]
            else:
                acc = None
                for comb, ci in zip(combs, comb_ids):
                    g = planes[ci]  # [C, H, W]
                    _, H, W = g.shape
                    idx, wgt = bilinear_corners(H, W, pts[:, list(comb)])
                    got = jnp.take(
                        g.reshape(c_dim, H * W), idx.reshape(-1), axis=1
                    )
                    feat = jnp.sum(got.reshape(c_dim, 4, n) * wgt[None], axis=1)
                    acc = feat if acc is None else acc * feat
            outs.append(acc)                             # [C, N] each
        return jnp.concatenate(outs, axis=0).reshape(
            len(params), c_dim, n
        ).transpose(2, 0, 1).reshape(n, len(params) * c_dim)

    def forward_static(self, params, pts):
        # static plane pts are ray positions (never learned): the kernel's
        # coordinate-gradient matmuls are skipped in the backward
        ids = [_COO_COMBS.index(c) for c in _STATIC_COMBS]
        return self._forward(params, pts, _STATIC_COMBS, ids, coord_grad=False)

    def forward_dynamic(self, params, pts):
        ids = [_COO_COMBS.index(c) for c in _DYNAMIC_COMBS]
        return self._forward(params, pts, _DYNAMIC_COMBS, ids)

    def forward_dynamic_scalar_t(self, params, xyz, t):
        """Dynamic (xt, yt, zt) features when every sample shares scalar t.

        This is the density-query case (lidar4d.density: one traced time per
        call): each [C, T, S] time plane collapses over its tiny time axis
        with the exact align_corners blend weights of grid_sample — in XLA,
        outside the hot loop — and the remaining lookup is 1-D interpolation,
        which `ops.plane_onehot.plane_linear` evaluates as a single one-hot
        MATMUL per scale. Bilinear-exact (up to bf16 matmul rounding) and
        removes both the gathers and the scatter-add backward.

        Args:
          xyz: [N, 3] spatial coords in [0, 1] (possibly flow-warped).
          t:   traced scalar in [0, 1].
        Returns:
          [N, output_dim * n_scales] — identical semantics to
          `forward_dynamic(params, concat([xyz, t], -1))`.
        """
        n = xyz.shape[0]
        c_dim = self.output_dim
        ids = [_COO_COMBS.index(c) for c in _DYNAMIC_COMBS]
        xs = jnp.stack([xyz[:, 0], xyz[:, 1], xyz[:, 2]])  # [3, N]
        t = jnp.asarray(t, jnp.float32)
        outs = []
        for planes in params:  # per scale
            g = jnp.stack([planes[ci] for ci in ids])  # [3, C, T, S]
            t_res = g.shape[2]
            v = jnp.clip(t, 0.0, 1.0) * (t_res - 1)
            y0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, t_res - 1)
            y1 = jnp.minimum(y0 + 1, t_res - 1)
            ty = v - y0.astype(jnp.float32)
            g_red = (1.0 - ty) * jnp.take(g, y0, axis=2) \
                + ty * jnp.take(g, y1, axis=2)            # [3, C, S]
            feats = plane_linear(g_red, xs)               # [3, N, C]
            outs.append(feats[0] * feats[1] * feats[2])   # [N, C]
        return jnp.concatenate(outs, axis=-1).reshape(n, len(params) * c_dim)

    def forward_dynamic_scalar_t_multi(self, params, xyzs, ts,
                                       coord_grad_lead=0):
        """Fused dynamic features for V time variants in one sweep per scale.

        The density query's flow-warp aggregation (lidar4d.density) evaluates
        the dynamic planes at (x, t), (x+f, t+dt), (x+b, t-dt) — three
        `forward_dynamic_scalar_t` calls whose per-scale one-hot matmuls are
        identical in shape. Stacking the V variants into plane_linear's batch
        axis issues ONE [V*3, N, S] x [V*3, C, S] dot_general per scale
        instead of three, cutting dispatch and letting the MXU pipeline the
        whole sweep. Numerically identical to V separate calls.

        Args:
          xyzs: [V, N, 3] spatial coords in [0, 1] (variants may be warped).
          ts:   [V] scalar times in [0, 1] (clip handled here).
          coord_grad_lead (static): the first `coord_grad_lead` VARIANTS get
            zero coordinate gradients and skip that half of the backward
            kernel. lidar4d.density passes 1: variant 0's coords are raw ray
            positions whose cotangent dies at the (non-learned) ray geometry,
            while the warped variants keep full coordinate grads — they are
            the flow net's only gradient path through the plane features
            (reference lidar4d.py:161-173; only the HASH neighbors sit under
            torch.no_grad()). Table gradients are unaffected.
        Returns:
          [V, N, output_dim * n_scales].
        """
        v, n = xyzs.shape[0], xyzs.shape[1]
        c_dim = self.output_dim
        ids = [_COO_COMBS.index(c) for c in _DYNAMIC_COMBS]
        ts = jnp.clip(jnp.asarray(ts, jnp.float32), 0.0, 1.0)           # [V]
        # [V, 3, N] -> [V*3, N]
        xs = xyzs.transpose(0, 2, 1).reshape(v * 3, n)
        outs = []
        for planes in params:  # per scale
            g = jnp.stack([planes[ci] for ci in ids])  # [3, C, T, S]
            t_res = g.shape[2]
            vv = ts * (t_res - 1)                                        # [V]
            y0 = jnp.clip(jnp.floor(vv).astype(jnp.int32), 0, t_res - 1)
            y1 = jnp.minimum(y0 + 1, t_res - 1)
            ty = (vv - y0.astype(jnp.float32))[:, None, None, None]
            g_red = (1.0 - ty) * jnp.take(g, y0, axis=2).transpose(2, 0, 1, 3) \
                + ty * jnp.take(g, y1, axis=2).transpose(2, 0, 1, 3)     # [V, 3, C, S]
            feats = plane_linear(
                g_red.reshape(v * 3, c_dim, g.shape[3]), xs,
                coord_grad_lead=3 * coord_grad_lead,  # variant-major P axis
            ).reshape(v, 3, n, c_dim)
            outs.append(feats[:, 0] * feats[:, 1] * feats[:, 2])         # [V, N, C]
        return jnp.concatenate(outs, axis=-1).reshape(
            v, n, len(params) * c_dim
        )

    def __call__(self, params, pts):
        return self.forward_static(params, pts), self.forward_dynamic(params, pts)
