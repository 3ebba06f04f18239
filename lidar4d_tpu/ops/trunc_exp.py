"""Truncated-gradient exponential activation.

Behavioral parity with the reference's autograd function
(`model/activation.py:6-20`): forward is exp(x) in fp32; the backward clamps
the *input* to [-15, 15] before computing the exp in the gradient, preventing
fp16/bf16 blow-ups of the density head.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x.astype(jnp.float32))


def _fwd(x):
    x32 = x.astype(jnp.float32)
    return jnp.exp(x32), x32


def _bwd(x32, g):
    return (g * jnp.exp(jnp.clip(x32, -15.0, 15.0)),)


trunc_exp.defvjp(_fwd, _bwd)
