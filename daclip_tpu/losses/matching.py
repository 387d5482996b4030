"""Maximum-likelihood matching loss for IR-SDE training.

Reference: config/daclip-sde/models/modules/loss.py:9-29 (MatchingLoss): per-sample
mean of |predict-target| (or squared), optionally weighted, then batch mean.
"""
from __future__ import annotations

import jax.numpy as jnp


def matching_loss(predict, target, loss_type: str = "l1", weights=None):
    if loss_type == "l1":
        per = jnp.abs(predict - target)
    elif loss_type == "l2":
        per = jnp.square(predict - target)
    else:
        raise ValueError(f"invalid loss type {loss_type!r}")
    per = per.reshape(per.shape[0], -1).mean(axis=-1)
    if weights is not None:
        per = per * weights.reshape(-1)
    return per.mean()
