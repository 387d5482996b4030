"""DA-CLIP training — the TPU-native harness core (reference:
da-clip/src/training/main.py:219-459 + train.py:64-245).

Key translations:
  * lock_clip (daclip_model.py:36-38) → the `clip` subtree is partitioned out of
    the optimizer AND `stop_gradient`-merged inside the loss, so XLA prunes the
    frozen-branch backward where possible; gradients still flow *through* the
    frozen ViT to the controller, exactly like torch requires_grad=False.
  * AdamW no-weight-decay group for gains/bias/logit_scale (main.py:304-319) →
    optax mask on ndim >= 2.
  * logit_scale clamp to [0, ln(100)] after each step (train.py:187-189).
  * gather_features → implicit GSPMD global-batch loss (losses/clip_loss.py).
  * grad accumulation (train.py:124-162) → optax.MultiSteps.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from daclip_tpu.losses import (clip_loss, daclip_loss_fork, daclip_loss_uir,
                               distill_clip_loss)
from daclip_tpu.train import schedules as sched


class ClipTrainState(NamedTuple):
    params: Any          # trainable subtree (visual_control, logit_scale, predictor)
    opt_state: Any
    step: jnp.ndarray


@dataclasses.dataclass
class ClipTrainConfig:
    """Mirrors training/params.py defaults for ViT-B-32 (params.py:5-11,26-459)."""
    lr: float = 5e-4
    beta1: float = 0.9
    beta2: float = 0.98
    eps: float = 1e-6
    wd: float = 0.2
    warmup: int = 10000
    total_steps: int = 100000
    lr_scheduler: str = "cosine"       # cosine | const | const-cooldown
    lr_cooldown_end: float = 0.0       # params.py --lr-cooldown-end
    lr_cooldown_power: float = 1.0     # params.py --lr-cooldown-power
    cooldown_steps: Optional[int] = None  # from --epochs-cooldown
    skip_scheduler: bool = False       # params.py --skip-scheduler
    grad_clip_norm: Optional[float] = None
    accum_freq: int = 1
    # fork (FCRC+regression) | uir (degra contrastive) | clip (plain InfoNCE)
    variant: str = "fork"
    distill: bool = False              # main.py:219-243 + DistillClipLoss
    patch_dropout: bool = False        # --force-patch-dropout active (clip
    #                                    variant only; needs a per-step rng)


def partition_daclip_params(params) -> Tuple[Any, Any]:
    """Split DaCLIP params into (trainable, frozen): `clip/*` is frozen
    (lock_clip, daclip_model.py:36-38); controller + logit_scale (+ predictor)
    train."""
    trainable = {k: v for k, v in params.items() if k != "clip"}
    frozen = {"clip": params["clip"]}
    return trainable, frozen


def merge_params(trainable, frozen):
    out = dict(trainable)
    out.update(frozen)
    return out


def make_optimizer(cfg: ClipTrainConfig, params_sample):
    if cfg.skip_scheduler:  # main.py:330: scheduler = None
        schedule = cfg.lr
    elif cfg.lr_scheduler == "cosine":
        schedule = sched.clip_cosine_lr(cfg.lr, cfg.warmup, cfg.total_steps)
    elif cfg.lr_scheduler == "const":
        schedule = sched.clip_const_lr(cfg.lr, cfg.warmup)
    elif cfg.lr_scheduler in ("const-cooldown", "const_cooldown"):
        schedule = sched.clip_const_lr_cooldown(
            cfg.lr, cfg.warmup, cfg.total_steps,
            cfg.cooldown_steps or cfg.total_steps // 10,
            cooldown_power=cfg.lr_cooldown_power,
            cooldown_end_lr=cfg.lr_cooldown_end)
    else:
        raise ValueError(
            f"Unknown scheduler {cfg.lr_scheduler!r}; options: cosine, const, "
            "const-cooldown (main.py:320-330)")

    def wd_mask(params):
        return jax.tree.map(lambda p: jnp.ndim(p) >= 2, params)

    tx = optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
                     weight_decay=cfg.wd, mask=wd_mask)
    if cfg.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    if cfg.accum_freq > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_freq)
    return tx


def init_state(params_trainable, cfg: ClipTrainConfig) -> ClipTrainState:
    tx = make_optimizer(cfg, params_trainable)
    return ClipTrainState(params=params_trainable,
                          opt_state=tx.init(params_trainable),
                          step=jnp.zeros((), jnp.int32))


def make_train_step(model_apply: Callable, frozen_params, cfg: ClipTrainConfig,
                    banks: Optional[Tuple] = None, update_mask=None,
                    distill_apply: Optional[Callable] = None):
    """Returns train_step(state, batch, frozen=None, distill_params=None)
    -> (state, metrics).

    `update_mask` (train/locking.py) implements LiT tower locking: a 0/1
    float pytree multiplied into the optimizer updates (requires_grad=False
    semantics incl. frozen weight decay).  `distill_apply` + per-call
    `distill_params` wire the teacher forward for DistillClipLoss
    (main.py:219-243, train.py:113-116) — teacher params are a jit argument
    for the same reason `frozen` is.

    batch: dict with images (B,H,W,3), texts (B,154) int32 [--da concat],
    gt_images, deg_type (B,4), gt_val (B,4).  `banks` = (bin_center_bank (4,7),
    all_d_type_tokens (28,77)) constants (fork variant).

    The frozen CLIP params should be passed PER CALL (the `frozen` argument of
    the returned step) so they enter the jitted program as device arguments;
    `frozen_params` here is only a default.  Closing them into the trace would
    inline ~150M f32 weights as HLO constants — a ~600 MB program that blows
    compile memory/time (and the axon remote-compile size limit).
    """
    tx = make_optimizer(cfg, None)
    default_frozen = frozen_params

    def loss_fn(trainable, batch, frozen, distill_params):
        if frozen:
            params = {"params": merge_params(
                trainable, jax.tree.map(jax.lax.stop_gradient, frozen))}
        else:
            params = {"params": trainable}
        kwargs = {}
        # --force-patch-dropout applies to every variant (reference
        # model.train() semantics); deterministic per-step rng derived from
        # the optimizer step so the step signature stays (state, batch, ...)
        if cfg.patch_dropout:
            rng = jax.random.fold_in(jax.random.PRNGKey(0), batch["_step"])
            kwargs = dict(train=True, rngs={"patch_dropout": rng})
        if cfg.variant == "fork" and banks is not None:
            kwargs.update(deg_type=batch["deg_type"], gt_val=batch["gt_val"],
                          bin_center_bank=jnp.asarray(banks[0]),
                          all_d_type_tokens=jnp.asarray(banks[1]))
            out = model_apply(params, image=batch["images"], text=batch["texts"],
                              gt_images=batch.get("gt_images"), **kwargs)
            losses = daclip_loss_fork(out)
        elif cfg.variant == "uir":
            out = model_apply(params, image=batch["images"],
                              text=batch["texts"], **kwargs)
            losses = daclip_loss_uir(out)
        else:  # plain CLIP harness path (main.py without --da)
            out = model_apply(params, image=batch["images"],
                              text=batch["texts"], **kwargs)
            if cfg.distill and distill_apply is not None:
                t_out = distill_apply({"params": distill_params},
                                      image=batch["images"],
                                      text=batch["texts"])
                t_out = jax.tree.map(jax.lax.stop_gradient, t_out)
                losses = distill_clip_loss(
                    out["image_features"], out["text_features"],
                    out["logit_scale"], t_out["image_features"],
                    t_out["text_features"], t_out["logit_scale"])
            else:
                losses = {"contrastive_loss": clip_loss(
                    out["image_features"], out["text_features"],
                    out["logit_scale"])}
        total = sum(jnp.asarray(v, jnp.float32) for v in losses.values())
        return total, losses

    def train_step(state: ClipTrainState, batch, frozen=None,
                   distill_params=None):
        if frozen is None:
            frozen = default_frozen
        if cfg.patch_dropout:
            batch = dict(batch)
            batch["_step"] = state.step
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, frozen, distill_params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if update_mask is not None:  # LiT locking (train/locking.py)
            from daclip_tpu.train.locking import apply_update_mask
            updates = apply_update_mask(updates, update_mask)
        params = optax.apply_updates(state.params, updates)
        # clamp logit_scale to [0, ln(100)] (train.py:187-189)
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0,
                                         math.log(100.0))
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["logit_scale"] = jnp.exp(params["logit_scale"])
        return ClipTrainState(params, opt_state, state.step + 1), metrics

    return train_step
