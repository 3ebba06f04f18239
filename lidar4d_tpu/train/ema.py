"""Exponential moving average of parameters, torch_ema semantics.

The reference wraps the model in torch_ema's ExponentialMovingAverage
(decay=0.95, `model/runner.py:97-98`) and calls `.update()` once per EPOCH
(`runner.py:534-535`), not per step. torch_ema ramps the effective decay
with the update count:  decay_eff = min(decay, (1 + n) / (10 + n)).
Evaluation / checkpoint-best / refine copy the EMA weights in
(`runner.py:565-567`, `runner.py:819-821`).
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    shadow: Any       # pytree matching params
    num_updates: Any  # int32 scalar


def ema_init(params) -> EmaState:
    return EmaState(shadow=jax.tree.map(jnp.asarray, params),
                    num_updates=jnp.int32(0))


def ema_update(state: EmaState, params, decay=0.95) -> EmaState:
    n = state.num_updates + 1
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    shadow = jax.tree.map(
        lambda s, p: s - (1.0 - d) * (s - p), state.shadow, params
    )
    return EmaState(shadow=shadow, num_updates=n)


def ema_params(state: EmaState):
    return state.shadow
