"""Contrastive losses for CLIP / DA-CLIP training — GSPMD-native.

The reference gathers features across ranks with torch.distributed
(`gather_features`, open_clip/loss.py:19-63) before the logit matmul.  On TPU we
compute the SAME global-batch loss by simply writing the full-batch einsum inside a
jit whose batch inputs are sharded over the `data` mesh axis: XLA inserts the
all-gather on ICI and gradients flow through it (the equivalent of
`torch.distributed.nn.all_gather`).  There is no local_loss/gather_with_grad knob
because GSPMD always produces the exact global loss.

Reference parity:
  ClipLoss                — open_clip/loss.py:66-132 (labels = arange, symmetric CE)
  UIR DaClipLoss          — universal-image-restoration/open_clip/loss.py:179-196
  fork DaClipLoss (FCRC)  — da-clip/src/open_clip/loss.py:180-395
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

TYPE_RANGES = ((0.5, 4.0), (5.0, 40.0), (0.5, 4.0), (10.0, 80.0))  # loss.py:209-214
NUM_TYPES, NUM_BINS = 4, 7


def _xent(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def clip_loss(image_features, text_features, logit_scale):
    """Symmetric InfoNCE over the (global) batch (loss.py:102-132)."""
    logits_per_image = logit_scale * jnp.einsum(
        "id,jd->ij", image_features, text_features,
        preferred_element_type=jnp.float32)
    labels = jnp.arange(logits_per_image.shape[0])
    return 0.5 * (_xent(logits_per_image, labels) + _xent(logits_per_image.T, labels))


def daclip_loss_uir(out: Dict, output_dict: bool = True):
    """Original DA-CLIP loss: caption contrastive + degradation contrastive
    (universal-image-restoration/open_clip/loss.py:181-196)."""
    c = clip_loss(out["image_features"], out["text_features"], out["logit_scale"])
    d = clip_loss(out["image_degra_features"], out["text_degra_features"],
                  out["logit_scale"])
    if output_dict:
        return {"contrastive_loss": c, "degra_loss": d}
    return c, d


def fcrc_loss(image_degra_features, all_d_type_tokens_features, gt_val,
              bin_center_features, deg_type, temperature: float = 0.07):
    """Fine-grained contrastive regression (FCRC) loss, fixed-shape/masked.

    Reference (da-clip/src/open_clip/loss.py:218-270) gathers the N existing
    (sample, type) pairs with torch.nonzero — dynamic shapes.  Here every (b, t)
    pair participates with a validity mask (XLA-friendly), which is mathematically
    identical: invalid pairs get zero λ-weight and are excluded from the mean.

    Note the reference's `neg` uses `(λ @ sim_exp).sum(1)`; since sim_exp rows sum
    to 1 after softmax this equals the λ row-sum — we keep the literal computation
    for clarity of parity.
    """
    B, D = image_degra_features.shape
    N = B * NUM_TYPES
    f32 = jnp.float32

    m = deg_type.reshape(N).astype(f32)                                     # (N,)
    f = image_degra_features.astype(f32)
    f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
    tok = all_d_type_tokens_features.astype(f32)
    tok = tok / (jnp.linalg.norm(tok, axis=-1, keepdims=True) + 1e-8)
    if tok.ndim == 2:
        sim = jnp.einsum("bd,kd->bk", f, tok)                                # (B, 28)
    else:
        sim = jnp.einsum("bd,bkd->bk", f, tok)
    sim_exp = jax.nn.softmax(sim / temperature, axis=-1)                     # (B, 28)

    centers = jnp.asarray(bin_center_features, f32)
    if centers.ndim == 2:
        centers = jnp.broadcast_to(centers, (B, NUM_TYPES, NUM_BINS))
    gt = jnp.asarray(gt_val, f32)                                            # (B, 4)
    bin_idx = jnp.argmin(jnp.abs(gt[..., None] - centers), axis=-1)          # (B, 4)
    type_idx = jnp.broadcast_to(jnp.arange(NUM_TYPES)[None, :], (B, NUM_TYPES))
    pos_token = type_idx * NUM_BINS + bin_idx                                # (B, 4)
    pos = jnp.take_along_axis(sim_exp, pos_token.reshape(B, NUM_TYPES),
                              axis=-1).reshape(N)                            # (N,)

    lows = jnp.asarray([r[0] for r in TYPE_RANGES], f32)
    highs = jnp.asarray([r[1] for r in TYPE_RANGES], f32)
    gt_norm = ((gt - lows) / (highs - lows + 1e-8)).reshape(N)

    tvec = type_idx.reshape(N)
    diff = jnp.abs(gt_norm[:, None] - gt_norm[None, :])                      # (N, N)
    same = (tvec[:, None] == tvec[None, :]).astype(f32)
    lam = same * diff + (1.0 - same) * 4.0
    lam = lam * (m[:, None] * m[None, :])          # mask invalid pairs
    lam = lam / (lam.sum(axis=1, keepdims=True) + 1e-8)

    sim_exp_pairs = jnp.repeat(sim_exp, NUM_TYPES, axis=0)                   # (N, 28)
    neg = (lam @ sim_exp_pairs).sum(axis=1) - jnp.diagonal(lam) * pos
    loss_i = -jnp.log(pos / (pos + neg + 1e-6))
    denom = jnp.maximum(m.sum(), 1.0)
    return jnp.where(m.sum() > 0, (loss_i * m).sum() / denom, 0.0)


def distill_clip_loss(image_features, text_features, logit_scale,
                      dist_image_features, dist_text_features, dist_logit_scale,
                      output_dict: bool = True):
    """DistillClipLoss (open_clip/loss.py:397-433): contrastive + teacher-student
    soft-label cross-entropy in both directions."""
    def logits(img, txt, scale):
        return scale * jnp.einsum("id,jd->ij", img, txt,
                                  preferred_element_type=jnp.float32)

    def dist(teacher, student):
        t = jax.nn.softmax(teacher, axis=1)
        s = jax.nn.log_softmax(student, axis=1)
        return -(t * s).sum(axis=1).mean()

    lpi = logits(image_features, text_features, logit_scale)
    dpi = logits(dist_image_features, dist_text_features, dist_logit_scale)
    labels = jnp.arange(lpi.shape[0])
    contrastive = 0.5 * (_xent(lpi, labels) + _xent(lpi.T, labels))
    distill = 0.5 * (dist(dpi, lpi) + dist(dpi.T, lpi.T))
    if output_dict:
        return {"contrastive_loss": contrastive, "distill_loss": distill}
    return contrastive, distill


def coca_loss(image_features, text_features, logits, labels, logit_scale,
              caption_loss_weight: float = 2.0, clip_loss_weight: float = 1.0,
              pad_id: int = 0, output_dict: bool = True):
    """CoCaLoss (open_clip/loss.py:135-178): weighted clip loss + caption CE with
    pad-token masking.  (The CoCa model itself is out of the DA-CLIP/IR path —
    SURVEY.md §2.1 'alt towers'; the loss is provided for API completeness.)"""
    c = 0.0
    if clip_loss_weight:
        c = clip_loss_weight * clip_loss(image_features, text_features,
                                         logit_scale)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    mask = (labels != pad_id).astype(jnp.float32)
    caption = caption_loss_weight * (nll * mask).sum() / jnp.maximum(mask.sum(), 1)
    if output_dict:
        return {"contrastive_loss": c, "caption_loss": caption}
    return c, caption


def daclip_loss_fork(out: Dict, l1_loss_weight: float = 0.1,
                     temperature: float = 0.07, output_dict: bool = True):
    """Fork DaClipLoss: clip + 0.1·L1(img, gt_img) + masked regression MSE + FCRC
    (da-clip/src/open_clip/loss.py:343-395)."""
    c = clip_loss(out["image_features"], out["text_features"], out["logit_scale"])

    gt_l1 = 0.0
    if out.get("gt_image_features") is not None:
        gt_l1 = l1_loss_weight * jnp.abs(
            out["image_features"].astype(jnp.float32)
            - out["gt_image_features"].astype(jnp.float32)).mean()

    reg_ls = 0.0
    if out.get("gt_val") is not None:
        m = out["deg_type"].astype(jnp.float32)
        pred = out["pred"].astype(jnp.float32)
        gt = out["gt_val"].astype(jnp.float32)
        loss_exist = (jnp.square(pred * m - gt * m).sum()) / (m.sum() + 1e-8)
        mn = 1.0 - m
        loss_non = (jnp.square(pred * mn).sum()) / (mn.sum() + 1e-8)
        reg_ls = loss_exist + loss_non

    fcrc = 0.0
    if out.get("all_d_type_tokens_features") is not None:  # predictor active
        fcrc = fcrc_loss(out["image_degra_features"],
                         out["all_d_type_tokens_features"], out["gt_val"],
                         out["bin_center_features"], out["deg_type"],
                         temperature)
    if output_dict:
        return {"contrastive_loss": c, "gt_l1_loss": gt_l1,
                "reg_ls_loss": reg_ls, "fcrc_loss": fcrc}
    return c, gt_l1, reg_ls, fcrc
