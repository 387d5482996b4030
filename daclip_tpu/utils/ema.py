"""Pytree EMA matching ema_pytorch semantics (used by the reference at
config/daclip-sde/models/denoising_model.py:118: EMA(model, beta=0.995,
update_every=10)).

ema_pytorch defaults replicated: update_after_step=100, inv_gamma=1.0, power=2/3,
decay(step) = min(beta, 1 - (1 + eff/inv_gamma)^(-power)) with
eff = max(step - update_after_step - 1, 0); decay is 0 until eff > 0 (pure copy).
Updates apply only every `update_every` optimizer steps.  Fully jit-compatible.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: dict         # shadow params
    step: jnp.ndarray    # int32 counter of .update() calls


def init(params) -> EMAState:
    return EMAState(params=jax.tree.map(jnp.asarray, params),
                    step=jnp.zeros((), jnp.int32))


def update(state: EMAState, params, beta: float = 0.995, update_every: int = 10,
           update_after_step: int = 100, inv_gamma: float = 1.0,
           power: float = 2.0 / 3.0) -> EMAState:
    step = state.step + 1
    eff = jnp.maximum(step.astype(jnp.float32) - update_after_step - 1, 0.0)
    decay = 1.0 - (1.0 + eff / inv_gamma) ** (-power)
    decay = jnp.where(eff <= 0.0, 0.0, jnp.minimum(decay, beta))
    do_update = (step % update_every) == 0
    d = jnp.where(do_update, decay, 1.0)

    new_params = jax.tree.map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), state.params, params)
    return EMAState(params=new_params, step=step)
