"""CLIP validation metrics — training/train.py:248-381 parity: val losses +
image↔text retrieval recall@{1,5,10} and mean rank / median rank."""
from __future__ import annotations

from typing import Dict

import numpy as np


def get_clip_metrics(image_features: np.ndarray, text_features: np.ndarray,
                     logit_scale: float) -> Dict[str, float]:
    """train.py:364-381: ranks of the matched pair in both directions."""
    metrics = {}
    logits_per_image = logit_scale * image_features @ text_features.T
    logits_per_text = logits_per_image.T
    n = logits_per_image.shape[0]
    ground_truth = np.arange(n)
    for name, logit in (("image_to_text", logits_per_image),
                        ("text_to_image", logits_per_text)):
        ranking = np.argsort(-logit, axis=1)
        preds = np.where(ranking == ground_truth[:, None])[1]
        metrics[f"{name}_mean_rank"] = float(preds.mean() + 1)
        metrics[f"{name}_median_rank"] = float(np.floor(np.median(preds)) + 1)
        for k in (1, 5, 10):
            metrics[f"{name}_R@{k}"] = float(np.mean(preds < k))
    return metrics


def evaluate(model_apply, params, dataset, batch_size: int = 64,
             banks=None, variant: str = "fork") -> Dict[str, float]:
    """Run val losses + retrieval over a CsvDataset-style dataset
    (train.py:248-363)."""
    import jax.numpy as jnp

    from daclip_tpu.losses import daclip_loss_fork, daclip_loss_uir

    all_img, all_txt = [], []
    losses = []
    n = len(dataset)
    for i in range(0, n, batch_size):
        samples = [dataset[j] for j in range(i, min(i + batch_size, n))]
        batch = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        kwargs = {}
        if variant == "fork" and banks is not None:
            kwargs = dict(deg_type=jnp.asarray(batch["deg_type"]),
                          gt_val=jnp.asarray(batch["gt_val"]),
                          bin_center_bank=jnp.asarray(banks[0]),
                          all_d_type_tokens=jnp.asarray(banks[1]))
        out = model_apply(params, image=jnp.asarray(batch["images"]),
                          text=jnp.asarray(batch["texts"]),
                          gt_images=jnp.asarray(batch.get("gt_images",
                                                          batch["images"])),
                          **kwargs)
        loss_d = (daclip_loss_fork(out) if variant == "fork"
                  else daclip_loss_uir(out))
        losses.append({k: float(v) for k, v in loss_d.items()})
        all_img.append(np.asarray(out["image_features"], np.float32))
        all_txt.append(np.asarray(out["text_features"], np.float32))
        scale = float(out["logit_scale"])

    img = np.concatenate(all_img)
    txt = np.concatenate(all_txt)
    metrics = get_clip_metrics(img, txt, scale)
    for k in losses[0]:
        metrics[f"val_{k}"] = float(np.mean([l[k] for l in losses]))
    metrics["num_samples"] = img.shape[0]
    return metrics
