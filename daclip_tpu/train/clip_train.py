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
  * grad accumulation (train.py:124-162) → make_accum_train_step, the
    reference-semantic cached-feature two-pass with GLOBAL negatives across
    the accumulated batch.  (make_train_step's optax.MultiSteps path remains
    for plain loss averaging, but it is NOT the reference semantics: each
    micro-batch only sees its own B negatives.)
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


# per-sample feature keys eligible for cached-feature splicing (everything the
# losses consume with a leading batch dim; batch-independent constants like
# all_d_type_tokens_features / bin_center_features are recomputed live)
_ACCUM_SPLICE_KEYS = ("image_features", "text_features",
                      "image_degra_features", "text_degra_features",
                      "gt_image_features", "pred", "deg_type", "gt_val")


def make_accum_train_step(model_apply: Callable, frozen_params,
                          cfg: ClipTrainConfig, banks: Optional[Tuple] = None,
                          update_mask=None):
    """REFERENCE-semantic gradient accumulation — the cached-feature
    global-negative two-pass of training/train.py:124-162, as one jit:

      pass 1: no-grad forward over all `accum_freq` micro-batches, caching
              per-sample features (train.py:125-135),
      pass 2: re-forward each micro-batch WITH grad, splicing its live
              features into the cached bank — so every micro-batch's loss is
              the FULL accum_freq·B-batch contrastive loss, with the other
              micro-batches as negatives (train.py:148-162's torch.cat of
              accumulated[:j] + [model_out] + accumulated[j+1:]),
      accumulated gradient = Σ_j ∂L/∂f_j·∂f_j/∂θ = the exact gradient of the
      full accum_freq·B-batch loss (each backward covers one feature block).

    `optax.MultiSteps` (make_optimizer's accum path, used by make_train_step)
    is NOT this: it averages per-micro-batch losses where each micro-batch
    only sees its own B negatives — a different contrastive objective.  Use
    THIS step to reproduce large-batch reference recipes on small-memory
    chips.

    Faithful quirks kept: the accumulated gradient is not divided by
    accum_freq (reference calls backward(total_loss) per j), and logit_scale —
    live in every pass-2 forward — receives accum_freq× its full-batch
    gradient, exactly like the reference where logit_scale participates in
    each backward.  GT images are NOT re-encoded in pass 2 (train.py:152
    calls model(images, texts)); their features come from the cache (the GT
    tower is the frozen CLIP, so no gradient is lost).

    Returns train_step(state, batches, frozen=None) where every `batches`
    leaf has leading shape (accum_freq, B, ...).  Distill is unsupported,
    matching the reference (its dist_model only runs in the accum_freq==1
    branch, train.py:109-121).
    """
    if cfg.accum_freq <= 1:
        raise ValueError("make_accum_train_step needs accum_freq > 1; "
                         "use make_train_step otherwise")
    if cfg.distill:
        raise ValueError(
            "distillation + grad accumulation is unsupported, as in the "
            "reference (train.py:109-121 only distills at accum_freq 1)")
    # the optimizer applies ONE real update per call here — no MultiSteps
    tx = make_optimizer(dataclasses.replace(cfg, accum_freq=1), None)
    default_frozen = frozen_params

    def forward(trainable, mb, frozen, step, j, include_gt):
        if frozen:
            params = {"params": merge_params(
                trainable, jax.tree.map(jax.lax.stop_gradient, frozen))}
        else:
            params = {"params": trainable}
        kwargs = {}
        if cfg.patch_dropout:
            # SAME rng per micro-batch in both passes, so spliced live
            # features equal their cached values and each loss_j is exactly
            # the full-batch loss
            rng = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(0), step), j)
            kwargs = dict(train=True, rngs={"patch_dropout": rng})
        if cfg.variant == "fork" and banks is not None:
            kwargs.update(deg_type=mb["deg_type"], gt_val=mb["gt_val"],
                          bin_center_bank=jnp.asarray(banks[0]),
                          all_d_type_tokens=jnp.asarray(banks[1]))
            return model_apply(
                params, image=mb["images"], text=mb["texts"],
                gt_images=mb.get("gt_images") if include_gt else None,
                **kwargs)
        return model_apply(params, image=mb["images"], text=mb["texts"],
                           **kwargs)

    def variant_losses(out):
        if cfg.variant == "fork" and banks is not None:
            return daclip_loss_fork(out)
        if cfg.variant == "uir":
            return daclip_loss_uir(out)
        return {"contrastive_loss": clip_loss(
            out["image_features"], out["text_features"], out["logit_scale"])}

    def loss_and_grads(trainable, batches, frozen, step):
        """Accumulated (total, losses, grads) over the two-pass — exposed so
        tests can assert grads == full-batch grads (see train_step attr)."""
        A, B = jax.tree.leaves(batches)[0].shape[:2]

        # ---- pass 1: cache features, no grad (train.py:125-135) ----------
        def cache_one(j):
            mb = jax.tree.map(lambda x: x[j], batches)
            out = forward(trainable, mb, frozen, step, j, include_gt=True)
            return {k: out[k] for k in _ACCUM_SPLICE_KEYS
                    if out.get(k) is not None}

        cached = jax.lax.stop_gradient(jax.lax.map(cache_one, jnp.arange(A)))
        flat_cache = {k: v.reshape((A * B,) + v.shape[2:])
                      for k, v in cached.items()}

        # ---- pass 2: per-micro-batch grad with global negatives ----------
        def loss_fn_j(params_j, j):
            mb = jax.tree.map(lambda x: x[j], batches)
            out = forward(params_j, mb, frozen, step, j, include_gt=False)
            spliced = dict(out)
            for k, flat in flat_cache.items():
                live = out.get(k)
                if live is None:  # e.g. gt features: cache-only in pass 2
                    spliced[k] = flat
                else:
                    spliced[k] = jax.lax.dynamic_update_slice_in_dim(
                        flat, live.astype(flat.dtype), j * B, axis=0)
            losses = variant_losses(spliced)
            total = sum(jnp.asarray(v, jnp.float32) for v in losses.values())
            losses = {k: jnp.asarray(v, jnp.float32)
                      for k, v in losses.items()}
            return total, losses

        grad_fn = jax.value_and_grad(loss_fn_j, has_aux=True)
        (total0, losses0), g0 = grad_fn(trainable, jnp.int32(0))

        def step_j(carry, j):
            g_acc, t_acc, l_acc = carry
            (tj, lj), gj = grad_fn(trainable, j)
            return (jax.tree.map(jnp.add, g_acc, gj), t_acc + tj,
                    jax.tree.map(jnp.add, l_acc, lj)), None

        (grads, total, losses), _ = jax.lax.scan(
            step_j, (g0, total0, losses0), jnp.arange(1, A))
        return total, losses, grads

    def train_step(state: ClipTrainState, batches, frozen=None,
                   distill_params=None):
        del distill_params  # rejected above; kept for signature parity
        if frozen is None:
            frozen = default_frozen
        A = jax.tree.leaves(batches)[0].shape[0]
        total, losses, grads = loss_and_grads(state.params, batches, frozen,
                                              state.step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if update_mask is not None:  # LiT locking (train/locking.py)
            from daclip_tpu.train.locking import apply_update_mask
            updates = apply_update_mask(updates, update_mask)
        params = optax.apply_updates(state.params, updates)
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0,
                                         math.log(100.0))
        # every loss_j is the same full-batch loss value — report the mean
        metrics = {k: v / A for k, v in losses.items()}
        metrics["total_loss"] = total / A
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["logit_scale"] = jnp.exp(params["logit_scale"])
        return ClipTrainState(params, opt_state, state.step + 1), metrics

    train_step.loss_and_grads = loss_and_grads  # test hook (grad parity)
    return train_step
