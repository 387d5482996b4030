"""Universal-image-restoration training: the TPU-native DenoisingModel.

Replaces the reference's stateful wrapper (config/daclip-sde/models/
denoising_model.py:25-201) with a functional, jitted train step:

  * `generate_random_states` + UNet forward + maximum-likelihood matching loss
    (denoising_model.py:129-150) in ONE jit, params donated,
  * optax AdamW/Adam/Lion (:68-88 — Lion is optax.lion),
  * cosine / multistep-restart schedules (:95-114),
  * EMA pytree (ema_pytorch parity, :118),
  * gradient averaging over the `data` mesh axis is implicit under GSPMD.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from daclip_tpu.losses.matching import matching_loss
from daclip_tpu.sde.irsde import IRSDE
from daclip_tpu.train import schedules as sched
from daclip_tpu.utils import ema as ema_lib


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: ema_lib.EMAState
    step: jnp.ndarray


@dataclasses.dataclass
class RestorationTrainConfig:
    """Mirrors options/train.yml `train:` keys (options.py / train.yml:62-86)."""
    optimizer: str = "AdamW"
    lr_G: float = 2e-4
    lr_scheme: str = "TrueCosineAnnealingLR"
    beta1: float = 0.9
    beta2: float = 0.99
    niter: int = 700_000
    warmup_iter: int = -1
    lr_steps: tuple = (200_000, 400_000, 600_000)
    lr_gamma: float = 0.5
    restarts: tuple = ()
    restart_weights: tuple = ()
    eta_min: float = 1e-6
    weight_decay_G: float = 0.0
    is_weighted: bool = False
    loss_type: str = "l1"
    weight: float = 1.0
    ema_beta: float = 0.995
    ema_update_every: int = 10
    grad_clip: Optional[float] = None


def make_schedule(cfg: RestorationTrainConfig):
    if cfg.lr_scheme == "TrueCosineAnnealingLR":
        s = sched.cosine_annealing(cfg.lr_G, cfg.niter, cfg.eta_min)
    elif cfg.lr_scheme == "MultiStepLR":
        s = sched.multistep_restart(cfg.lr_G, cfg.lr_steps, cfg.lr_gamma,
                                    cfg.restarts, cfg.restart_weights)
    else:
        raise ValueError(f"unknown lr_scheme {cfg.lr_scheme!r}")
    return sched.warmup_override(s, cfg.warmup_iter, cfg.lr_G)


def make_optimizer(cfg: RestorationTrainConfig):
    schedule = make_schedule(cfg)
    kw = dict(b1=cfg.beta1, b2=cfg.beta2, weight_decay=cfg.weight_decay_G)
    name = cfg.optimizer.lower()
    if name == "adam":
        tx = optax.adamw(schedule, **kw) if cfg.weight_decay_G else optax.adam(
            schedule, b1=cfg.beta1, b2=cfg.beta2)
    elif name == "adamw":
        tx = optax.adamw(schedule, **kw)
    elif name == "lion":
        tx = optax.lion(schedule, b1=cfg.beta1, b2=cfg.beta2,
                        weight_decay=cfg.weight_decay_G)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def init_state(params, cfg: RestorationTrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(params=params, opt_state=tx.init(params),
                      ema=ema_lib.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(unet_apply: Callable, sde: IRSDE,
                    cfg: RestorationTrainConfig):
    """Returns train_step(state, batch, key) -> (state, metrics).

    batch: dict with 'LQ', 'GT' (B,H,W,C f32 in [0,1]) and optional
    'text_context'/'image_context' (B, D).  The whole reference step
    (train.py:245-265 + denoising_model.py:129-150) is one XLA program.
    """
    tx = make_optimizer(cfg)

    def train_step(state: TrainState, batch, key):
        lq, gt = batch["LQ"], batch["GT"]
        tctx = batch.get("text_context")
        ictx = batch.get("image_context")
        timesteps, xt = sde.generate_random_states(key, gt, lq)
        t_model = timesteps.reshape(-1).astype(jnp.float32)

        def loss_fn(params):
            noise = unet_apply(params, xt, lq, t_model, tctx, ictx)
            score = sde.get_score_from_noise(noise, timesteps)
            xt_1_exp = sde.reverse_sde_step_mean(xt, score, lq, timesteps)
            xt_1_opt = sde.reverse_optimum_step(xt, gt, lq, timesteps)
            return cfg.weight * matching_loss(xt_1_exp, xt_1_opt, cfg.loss_type)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_lib.update(state.ema, params, beta=cfg.ema_beta,
                             update_every=cfg.ema_update_every)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads),
                   "lr": make_schedule(cfg)(state.step)}
        return TrainState(params, opt_state, ema, state.step + 1), metrics

    return train_step


def make_sampler(unet_apply: Callable, sde: IRSDE, mode: str = "posterior"):
    """Jittable full-resolution restore: (params, LQ, key, contexts) -> output.
    Mirrors DenoisingModel.test (denoising_model.py:152-162)."""

    def sample(params, lq, key, text_context=None, image_context=None):
        def noise_fn(x, mu, t, **ctx):
            return unet_apply(params, x, mu, t, ctx.get("text_context"),
                              ctx.get("image_context"))

        k_init, k_samp = jax.random.split(key)
        x_T = sde.noise_state(k_init, lq)
        if mode == "sde":
            return sde.reverse_sde(noise_fn, x_T, lq, k_samp,
                                   text_context=text_context,
                                   image_context=image_context)
        if mode == "ode":
            return sde.reverse_ode(noise_fn, x_T, lq,
                                   text_context=text_context,
                                   image_context=image_context)
        return sde.reverse_posterior(noise_fn, x_T, lq, k_samp,
                                     text_context=text_context,
                                     image_context=image_context)

    return sample
