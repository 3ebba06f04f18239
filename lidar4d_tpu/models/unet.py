"""Ray-drop refinement U-Net, functional JAX.

Behavioral re-design of the reference's `model/unet.py` (UNet, unet.py:139-171):
in 3ch (raydrop, intensity, depth) -> 1ch refined ray-drop probability.
Encoder: 1x1 in-conv to 32ch, 4x (maxpool2 + DoubleConv) doubling to 256;
bottleneck multi-head self-attention with Bernoulli additive attention
dropout (unet.py:97-104); decoder: 4x (bilinear x2 align_corners upsample +
pad-to-skip + concat + DoubleConv); out 1x1 conv + sigmoid.

DoubleConv is pre-activation style: (BN -> ReLU -> Dropout2d -> Conv3x3) x 2
with bias-free convs (unet.py:14-34). BatchNorm carries explicit running
stats in a separate `state` pytree (torch semantics: train normalizes with
batch stats and updates running stats with momentum 0.1, eval uses running
stats); convs lower to MXU via lax.conv_general_dilated.
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp

_DN = ("NCHW", "OIHW", "NCHW")


def _conv_init(key, out_ch, in_ch, k):
    """torch Conv2d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = in_ch * k * k
    bound = fan_in ** -0.5
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (out_ch, in_ch, k, k), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (out_ch,), jnp.float32, -bound, bound)
    return w, b


def _conv(x, w, b=None, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), padding, dimension_numbers=_DN,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def _bn_init(ch):
    return (
        {"scale": jnp.ones((ch,)), "bias": jnp.zeros((ch,))},
        {"mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))},
    )


def _bn(p, s, x, train, momentum=0.1, eps=1e-5):
    if train:
        mean = jnp.mean(x, axis=(0, 2, 3))
        var = jnp.var(x, axis=(0, 2, 3))
        n = x.shape[0] * x.shape[2] * x.shape[3]
        unbiased = var * n / max(n - 1, 1)
        new_s = {
            "mean": (1 - momentum) * s["mean"] + momentum * mean,
            "var": (1 - momentum) * s["var"] + momentum * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean[None, :, None, None]) * inv[None, :, None, None]
    return y * p["scale"][None, :, None, None] + p["bias"][None, :, None, None], new_s


def _dropout2d(x, rate, train, key):
    if not train or rate == 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, (x.shape[0], x.shape[1], 1, 1))
    return x * keep / (1.0 - rate)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )


def _upsample2x_align_corners(x):
    """Bilinear x2 with torch align_corners=True semantics."""
    def interp_axis(v, axis):
        size_in = v.shape[axis]
        size_out = 2 * size_in
        if size_in == 1:
            return jnp.repeat(v, 2, axis=axis)
        coords = jnp.linspace(0.0, size_in - 1.0, size_out)
        i0 = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, size_in - 1)
        i1 = jnp.clip(i0 + 1, 0, size_in - 1)
        w = (coords - i0).astype(v.dtype)
        g0 = jnp.take(v, i0, axis=axis)
        g1 = jnp.take(v, i1, axis=axis)
        shape = [1] * v.ndim
        shape[axis] = size_out
        w = w.reshape(shape)
        return g0 * (1 - w) + g1 * w

    return interp_axis(interp_axis(x, 2), 3)


def _pad_to(x, target_h, target_w):
    """F.pad([dx//2, dx-dx//2, dy//2, dy-dy//2]) to match skip dims (unet.py:64-68)."""
    dy = target_h - x.shape[2]
    dx = target_w - x.shape[3]
    return jnp.pad(
        x,
        ((0, 0), (0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2)),
    )


@dataclass(frozen=True)
class UNet:
    in_channels: int = 3
    channels: int = 32
    out_channels: int = 1
    dropout: float = 0.1
    num_heads: int = 8

    # ------------------------------------------------------------------ init
    def _double_conv_init(self, key, in_ch, out_ch, mid_ch=None):
        mid_ch = mid_ch or out_ch
        k1, k2 = jax.random.split(key)
        bn1_p, bn1_s = _bn_init(in_ch)
        bn2_p, bn2_s = _bn_init(mid_ch)
        w1, _ = _conv_init(k1, mid_ch, in_ch, 3)
        w2, _ = _conv_init(k2, out_ch, mid_ch, 3)
        params = {"bn1": bn1_p, "conv1": w1, "bn2": bn2_p, "conv2": w2}
        state = {"bn1": bn1_s, "bn2": bn2_s}
        return params, state

    def init(self, key):
        c = self.channels
        ks = jax.random.split(key, 12)
        params, state = {}, {}

        w, b = _conv_init(ks[0], c, self.in_channels, 1)
        params["inc"] = {"w": w, "b": b}

        downs = [(c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c), (8 * c, 8 * c)]
        for i, (ci, co) in enumerate(downs):
            p, s = self._double_conv_init(ks[1 + i], ci, co)
            params[f"down{i + 1}"], state[f"down{i + 1}"] = p, s

        # attention at 8c
        ca = 8 * c
        kq, kp = jax.random.split(ks[5])
        bn_p, bn_s = _bn_init(ca)
        wq, _ = _conv_init(kq, ca * 3, ca, 1)
        wp, _ = _conv_init(kp, ca, ca, 1)
        params["attn"] = {"bn": bn_p, "qkv": wq, "proj": wp}
        state["attn"] = {"bn": bn_s}

        ups = [
            (16 * c, 4 * c, 16 * c),
            (8 * c, 2 * c, 8 * c),
            (4 * c, c, 4 * c),
            (2 * c, c, 2 * c),
        ]
        for i, (ci, co, mid) in enumerate(ups):
            p, s = self._double_conv_init(ks[6 + i], ci, co, mid)
            params[f"up{i + 1}"], state[f"up{i + 1}"] = p, s

        bn_p, bn_s = _bn_init(c)
        w, b = _conv_init(ks[10], self.out_channels, c, 1)
        params["outc"] = {"bn": bn_p, "w": w, "b": b}
        state["outc"] = {"bn": bn_s}
        return {"params": params, "state": state}

    # --------------------------------------------------------------- forward
    def _double_conv(self, p, s, x, train, key):
        k1, k2 = (jax.random.split(key) if key is not None else (None, None))
        h, s1 = _bn(p["bn1"], s["bn1"], x, train)
        h = jax.nn.relu(h)
        h = _dropout2d(h, self.dropout, train, k1)
        h = _conv(h, p["conv1"])
        h, s2 = _bn(p["bn2"], s["bn2"], h, train)
        h = jax.nn.relu(h)
        h = _dropout2d(h, self.dropout, train, k2)
        h = _conv(h, p["conv2"])
        return h, {"bn1": s1, "bn2": s2}

    def _attn(self, p, s, x, train, key):
        B, C, H, W = x.shape
        h, s_bn = _bn(p["bn"], s["bn"], x, train)
        qkv = _conv(h, p["qkv"])
        q, k, v = jnp.split(qkv, 3, axis=1)
        nh = self.num_heads
        ch = C // nh
        q = q.reshape(B, nh, ch, H * W).transpose(0, 1, 3, 2)  # [B,nh,HW,ch]
        k = k.reshape(B, nh, ch, H * W)                         # [B,nh,ch,HW]
        v = v.reshape(B, nh, ch, H * W).transpose(0, 1, 3, 2)
        w = jnp.einsum("bhnc,bhcm->bhnm", q, k) * (ch ** -0.5)
        if train and key is not None:
            # Bernoulli additive attention dropout (unet.py:100-102)
            drop = jax.random.bernoulli(key, self.dropout, w.shape)
            w = w + drop * -1e12
        w = jax.nn.softmax(w, axis=-1)
        h = jnp.einsum("bhnm,bhmc->bhnc", w, v)  # [B,nh,HW,ch]
        # the reference's h.view(B, H, W, C) flattens (nh, HW, ch) row-major
        h = h.reshape(B, H, W, C).transpose(0, 3, 1, 2)
        h = _conv(h, p["proj"])
        return x + h, {"bn": s_bn}

    def apply(self, variables, x, train=False, key=None):
        """x: [B, 3, H, W] -> ([B, 1, H, W] sigmoid probs, new_state)."""
        p, s = variables["params"], variables["state"]
        new_s = {}
        keys = (
            jax.random.split(key, 10) if key is not None else [None] * 10
        )

        x0 = _conv(x, p["inc"]["w"], p["inc"]["b"])
        feats = [x0]
        h = x0
        for i in range(4):
            h = _maxpool2(h)
            h, ns = self._double_conv(p[f"down{i + 1}"], s[f"down{i + 1}"], h, train, keys[i])
            new_s[f"down{i + 1}"] = ns
            feats.append(h)

        h, ns = self._attn(p["attn"], s["attn"], h, train, keys[4])
        new_s["attn"] = ns

        skips = [feats[3], feats[2], feats[1], feats[0]]
        for i in range(4):
            skip = skips[i]
            h = _upsample2x_align_corners(h)
            h = _pad_to(h, skip.shape[2], skip.shape[3])
            h = jnp.concatenate([skip, h], axis=1)
            h, ns = self._double_conv(p[f"up{i + 1}"], s[f"up{i + 1}"], h, train, keys[5 + i])
            new_s[f"up{i + 1}"] = ns

        h, ns = _bn(p["outc"]["bn"], s["outc"]["bn"], h, train)
        new_s["outc"] = {"bn": ns}
        h = jax.nn.relu(h)
        logits = _conv(h, p["outc"]["w"], p["outc"]["b"])
        return jax.nn.sigmoid(logits), new_s
