"""Optimizer: Adam with per-module LR groups and exponential decay.

Parity with the reference:
  * Adam(betas=(0.9, 0.99), eps=1e-15) over get_params' groups
    (`main_lidar4d.py:298-300`, `model/lidar4d.py:226-237`): encoders at lr,
    flow/sigma/intensity/raydrop heads at 0.1x lr;
  * per-step LambdaLR decay 0.1 ** (iter / iters) (`main_lidar4d.py:302-305`).

Two equivalent implementations:
  * make_optimizer (default, FLAT): the non-UNet leaves are raveled into ONE
    vector, optax.scale_by_adam runs on that vector, and the per-group LR
    multiplier is an elementwise {1.0, 0.1} vector. Adam is elementwise, so
    this is bitwise-identical to the grouped form (test_train.py) — but it
    runs as a handful of large fused kernels instead of ~120 tiny per-leaf
    ones (the measured ~11 ms optimizer slice of the step, PERF.md r3).
  * make_grouped_optimizer: optax.multi_transform over the field's
    param-group labels — the direct torch-param-groups analogue, kept as
    the readable spec and the equivalence-test oracle.

UNet params get zero updates in both (trained separately in the refine
stage); the flat form simply leaves them out of the vector.
"""

import jax
import jax.numpy as jnp
import optax


def lr_schedule(lr, iters):
    """0.1 ** min(step / iters, 1) decay (main_lidar4d.py:303-305)."""

    def fn(step):
        return lr * 0.1 ** jnp.minimum(step / iters, 1.0)

    return fn


def make_optimizer(lr, iters, labels):
    """Flat single-vector Adam, bitwise-equal to make_grouped_optimizer.

    Args:
      lr:     base learning rate.
      iters:  total steps for the decay schedule.
      labels: pytree of 'base' | 'head' | 'unet' labels matching params
              (LiDAR4DField.param_group_labels).
    """
    treedef = jax.tree.structure(labels)
    lbl = jax.tree.leaves(labels)
    # The flat form maps any unknown label to the 1.0 base multiplier, so a
    # typo'd label would silently train at full LR (the grouped
    # multi_transform would raise). Fail at build time instead.
    unknown = sorted(set(lbl) - {"base", "head", "unet"})
    if unknown:
        raise ValueError(
            f"unknown param-group labels {unknown}; expected base/head/unet"
        )
    inner = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15)
    sched = lr_schedule(lr, iters)

    def _flatten(tree):
        leaves = treedef.flatten_up_to(tree)
        return leaves, jnp.concatenate(
            [g.ravel() for g, l in zip(leaves, lbl) if l != "unet"]
        )

    def init(params):
        _, flat = _flatten(params)
        return {"adam": inner.init(flat),
                "count": jnp.zeros([], jnp.int32)}

    def update(grads, state, params=None):
        g_leaves, flat = _flatten(grads)
        adam_u, adam_s = inner.update(flat, state["adam"])
        # Per-element LR: mult_vec * (-sched) multiplies each element by the
        # identical (mult * sched) scalar the grouped chain would use (IEEE
        # multiply magnitude is order-independent for a sign flip), so the
        # final update is bitwise-equal to scale_by_learning_rate's.
        mult = jnp.concatenate(
            [jnp.full((g.size,), 0.1 if l == "head" else 1.0, flat.dtype)
             for g, l in zip(g_leaves, lbl) if l != "unet"]
        )
        out_flat = adam_u * (mult * (-sched(state["count"])))
        new_leaves, off = [], 0
        for g, l in zip(g_leaves, lbl):
            if l == "unet":
                new_leaves.append(jnp.zeros_like(g))
            else:
                new_leaves.append(out_flat[off:off + g.size].reshape(g.shape))
                off += g.size
        return (
            jax.tree.unflatten(treedef, new_leaves),
            {"adam": adam_s,
             "count": optax.safe_int32_increment(state["count"])},
        )

    return optax.GradientTransformation(init, update)


def make_grouped_optimizer(lr, iters, labels):
    """The grouped-LR Adam chain (multi_transform) — the readable spec and
    the oracle for make_optimizer's exact-equivalence test."""
    def adam_group(mult):
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15),
            optax.scale_by_learning_rate(
                lambda step: mult * lr_schedule(lr, iters)(step)
            ),
        )

    return optax.multi_transform(
        {
            "base": adam_group(1.0),
            "head": adam_group(0.1),  # lidar4d.py:231-234: 0.1 * lr
            "unet": optax.set_to_zero(),  # trained separately in the refine stage
        },
        labels,
    )
