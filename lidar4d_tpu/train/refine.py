"""Ray-drop refinement stage: 1000 Adam steps on the U-Net only.

Parity with `Trainer.refine` (`model/runner.py:818-922`):
  * EMA weights are copied into the model first (runner.py:819-821);
  * all train frames are staged-rendered once into [B, 3, H, W] inputs
    (raydrop, intensity, depth) with [B, 1, H, W] GT raydrop;
  * 1000 steps of Adam(lr=1e-3) + OneCycleLR (torch defaults: pct_start 0.3,
    cosine anneal, div_factor 25, final_div_factor 1e4, beta1 cycled
    0.95 -> 0.85 -> 0.95) minimizing BCE;
  * per-step random rectangular mask augmentation: up to 32 boxes of up to
    10% H x 10% W zeroed out of the input (runner.py:888-898).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax


def onecycle_lr(max_lr, total_steps, pct_start=0.3, div_factor=25.0,
                final_div_factor=1e4):
    initial = max_lr / div_factor
    final = initial / final_div_factor
    up = int(float(pct_start) * total_steps) - 1
    down = total_steps - up - 1

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        pct_up = jnp.clip(step / jnp.maximum(up, 1), 0.0, 1.0)
        lr_up = max_lr + (initial - max_lr) / 2.0 * (1 + jnp.cos(jnp.pi * pct_up))
        pct_dn = jnp.clip((step - up) / jnp.maximum(down, 1), 0.0, 1.0)
        lr_dn = final + (max_lr - final) / 2.0 * (1 + jnp.cos(jnp.pi * pct_dn))
        return jnp.where(step <= up, lr_up, lr_dn)

    return fn


def onecycle_b1(total_steps, pct_start=0.3, max_m=0.95, base_m=0.85):
    up = int(float(pct_start) * total_steps) - 1
    down = total_steps - up - 1

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        pct_up = jnp.clip(step / jnp.maximum(up, 1), 0.0, 1.0)
        m_up = base_m + (max_m - base_m) / 2.0 * (1 + jnp.cos(jnp.pi * pct_up))
        pct_dn = jnp.clip((step - up) / jnp.maximum(down, 1), 0.0, 1.0)
        m_dn = max_m + (base_m - max_m) / 2.0 * (1 + jnp.cos(jnp.pi * pct_dn))
        return jnp.where(step <= up, m_up, m_dn)

    return fn


def _random_box_mask(key, shape, box_num_max=32):
    """Reference's mask augmentation (runner.py:888-898), static-shape.

    shape: (B, C, H, W). Up to box_num_max boxes of size [1, 0.1*dim) each.
    """
    B, C, H, W = shape
    by_max = max(int(0.1 * H), 2)
    bx_max = max(int(0.1 * W), 2)
    keys = jax.random.split(key, 5)
    nbox = jax.random.randint(keys[0], (), 0, box_num_max)
    ys = jax.random.randint(keys[1], (box_num_max,), 0, H - by_max)
    xs = jax.random.randint(keys[2], (box_num_max,), 0, W - bx_max)
    hs = jax.random.randint(keys[3], (box_num_max,), 1, by_max)
    ws = jax.random.randint(keys[4], (box_num_max,), 1, bx_max)

    row = jnp.arange(H)[:, None]
    col = jnp.arange(W)[None, :]
    mask = jnp.ones((H, W), jnp.float32)
    for j in range(box_num_max):
        active = (j < nbox).astype(jnp.float32)
        in_box = (
            (row >= ys[j]) & (row < ys[j] + hs[j])
            & (col >= xs[j]) & (col < xs[j] + ws[j])
        ).astype(jnp.float32)
        mask = mask * (1.0 - active * in_box)
    return mask[None, None]  # broadcast over B, C


def refine_unet(unet, variables, inputs, gts, *, steps=1000, lr=1e-3,
                batch_size=None, key=None, log_fn=print, log_every=50):
    """Optimize the U-Net on cached renders.

    Args:
      unet:      models.UNet.
      variables: {'params', 'state'} U-Net pytree.
      inputs:    [B, 3, H, W] (raydrop, intensity, depth) renders.
      gts:       [B, 1, H, W] GT raydrop.
    Returns updated variables.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    opt = optax.inject_hyperparams(optax.adam)(
        learning_rate=onecycle_lr(lr, steps), b1=onecycle_b1(steps)
    )
    params = variables["params"]
    bn_state = variables["state"]
    opt_state = opt.init(params)

    def loss_fn(p, s, x, gt, k):
        k_mask, k_drop = jax.random.split(k)
        x = x * _random_box_mask(k_mask, x.shape)
        pred, new_s = unet.apply({"params": p, "state": s}, x, train=True, key=k_drop)
        pred = jnp.clip(pred, 1e-7, 1 - 1e-7)
        bce = -jnp.mean(gt * jnp.log(pred) + (1 - gt) * jnp.log(1 - pred))
        return bce, new_s

    @jax.jit
    def step(p, s, o, x, gt, k):
        (loss, new_s), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, s, x, gt, k)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, new_s, o, loss

    B = inputs.shape[0]
    rng = np.random.default_rng(0)
    for i in range(steps):
        key, k_step = jax.random.split(key)
        if batch_size is not None and batch_size < B:
            idx = jnp.asarray(rng.choice(B, batch_size, replace=False))
            x, gt = inputs[idx], gts[idx]
        else:
            x, gt = inputs, gts
        params, bn_state, opt_state, loss = step(
            params, bn_state, opt_state, x, gt, k_step
        )
        if i % log_every == 0:
            log_fn(f"refine iter {i}: raydrop bce {float(loss):.6f}")

    return {"params": params, "state": bn_state}
