"""LR schedules mirroring both reference systems as optax schedules.

  * TrueCosineAnnealingLR (torch CosineAnnealingLR, denoising_model.py:107-114)
  * MultiStepLR_Restart (config/daclip-sde/models/lr_scheduler.py:8-44)
  * CLIP-harness cosine/const/const-cooldown closures (training/scheduler.py:13-53)
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np


def cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0):
    """torch.optim.lr_scheduler.CosineAnnealingLR: η(t) = η_min +
    (η0-η_min)(1+cos(πt/T))/2."""
    def schedule(step):
        t = jnp.minimum(step, t_max).astype(jnp.float32)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1 + jnp.cos(jnp.pi * t / t_max))
    return schedule


def multistep_restart(base_lr: float, milestones: Sequence[int],
                      gamma: float = 0.5,
                      restarts: Optional[Sequence[int]] = None,
                      restart_weights: Optional[Sequence[float]] = None):
    """MultiStepLR with optional warm restarts (lr_scheduler.py:8-44): lr is
    base·gamma^(#milestones passed); at a restart step the lr resets to
    base·weight and milestone counting restarts."""
    restarts = list(restarts or [])
    restart_weights = list(restart_weights or [1.0] * len(restarts))
    assert len(restarts) == len(restart_weights)
    milestones = jnp.asarray(sorted(milestones), jnp.int32)
    rst = jnp.asarray(sorted(restarts), jnp.int32) if restarts else None

    def schedule(step):
        step = jnp.asarray(step, jnp.int32)
        # which restart segment are we in?  (jnp indexing — `step` is traced
        # under jit, numpy arrays would raise TracerArrayConversionError)
        seg = jnp.sum(step >= rst) if len(restarts) else 0
        seg_start = jnp.where(seg > 0, rst[jnp.maximum(seg - 1, 0)], 0) \
            if len(restarts) else 0
        weight = jnp.where(seg > 0,
                           jnp.asarray(list(restart_weights) or [1.0],
                                       jnp.float32)[jnp.maximum(seg - 1, 0)],
                           1.0) if len(restarts) else 1.0
        n = jnp.sum((milestones > seg_start) & (milestones <= step))
        return base_lr * weight * (gamma ** n.astype(jnp.float32))
    return schedule


def clip_cosine_lr(base_lr: float, warmup: int, total_steps: int):
    """training/scheduler.py:30-38: linear warmup then cosine decay to 0."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / max(warmup, 1)
        e = (step - warmup) / max(total_steps - warmup, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e)) * base_lr
        return jnp.where(step < warmup, warm, cos)
    return schedule


def clip_const_lr(base_lr: float, warmup: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / max(warmup, 1)
        return jnp.where(step < warmup, warm, base_lr)
    return schedule


def clip_const_lr_cooldown(base_lr: float, warmup: int, total_steps: int,
                           cooldown_steps: int, cooldown_power: float = 1.0,
                           cooldown_end_lr: float = 0.0):
    """training/scheduler.py:41-53."""
    start_cooldown = total_steps - cooldown_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (step + 1) / max(warmup, 1)
        e = jnp.clip((step - start_cooldown) / max(cooldown_steps, 1), 0, 1)
        decay = (1 - e) ** cooldown_power
        cool = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        out = jnp.where(step < start_cooldown, base_lr, cool)
        return jnp.where(step < warmup, warm, out)
    return schedule


def warmup_override(schedule, warmup_iter: int, base_lr: float):
    """UIR warmup: linear ramp overriding the base schedule for the first
    warmup_iter steps (base_model.py:52-64)."""
    if warmup_iter <= 0:
        return schedule
    def wrapped(step):
        s = jnp.asarray(step, jnp.float32)
        warm = base_lr * (s + 1) / warmup_iter
        return jnp.where(s < warmup_iter, warm, schedule(step))
    return wrapped
