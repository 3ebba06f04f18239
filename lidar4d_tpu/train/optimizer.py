"""Optimizer: Adam with per-module LR groups and exponential decay.

Parity with the reference:
  * Adam(betas=(0.9, 0.99), eps=1e-15) over get_params' groups
    (`main_lidar4d.py:298-300`, `model/lidar4d.py:226-237`): encoders at lr,
    flow/sigma/intensity/raydrop heads at 0.1x lr;
  * per-step LambdaLR decay 0.1 ** (iter / iters) (`main_lidar4d.py:302-305`).

Implemented as optax.multi_transform over the field's param-group labels —
the label pytree is the idiomatic JAX equivalent of torch param groups.
"""

import jax.numpy as jnp
import optax


def lr_schedule(lr, iters):
    """0.1 ** min(step / iters, 1) decay (main_lidar4d.py:303-305)."""

    def fn(step):
        return lr * 0.1 ** jnp.minimum(step / iters, 1.0)

    return fn


def make_optimizer(lr, iters, labels):
    """Build the grouped-LR Adam chain.

    Args:
      lr:     base learning rate.
      iters:  total steps for the decay schedule.
      labels: pytree of 'base' | 'head' | 'unet' labels matching params
              (LiDAR4DField.param_group_labels).
    """
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
