"""ImageNet zero-shot evaluation CLI — training/zero_shot.py:18-84 parity.

Expects an ImageNet-style directory tree (<root>/<class_dir>/*.jpg) with class
dirs in sorted order mapping to the 1000 vendored classnames (or a custom
--classnames json list).

  python -m daclip_tpu.eval.imagenet_zero_shot --dataset val/ \
      --checkpoint pretrained/daclip_ViT-B-32.pt
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def evaluate_with_encoders(encode_image, encode_text, dataset: str,
                           image_size: int, batch_size: int = 64,
                           max_per_class=None, classnames=None):
    """Zero-shot top-1/top-5 with already-built (jitted) encoders — the
    in-training path (--imagenet-val + --zeroshot-frequency,
    training/train.py:380 → zero_shot.py:63-84)."""
    import jax.numpy as jnp

    from daclip_tpu.eval.zero_shot import (accuracy, build_zero_shot_classifier,
                                           load_imagenet_metadata)
    from daclip_tpu.tokenizer import tokenize
    from daclip_tpu.transforms import clip_transform
    from daclip_tpu.data.util import read_img

    meta_names, templates = load_imagenet_metadata()
    dirs = sorted(d for d in os.listdir(dataset)
                  if os.path.isdir(os.path.join(dataset, d)))
    names = classnames or (meta_names if len(dirs) == 1000 else dirs)
    classifier = build_zero_shot_classifier(encode_text, tokenize, names,
                                            templates)   # (D, C)
    classifier = np.asarray(classifier, np.float32)

    res = int(image_size)
    logits_all, targets = [], []
    for ci, d in enumerate(dirs):
        files = sorted(os.listdir(os.path.join(dataset, d)))[:max_per_class]
        for i in range(0, len(files), batch_size):
            batch = [clip_transform(
                read_img(None, os.path.join(dataset, d, f))[:, :, ::-1], res)
                for f in files[i: i + batch_size]]
            feats = np.asarray(encode_image(jnp.asarray(np.stack(batch))),
                               np.float32)
            logits_all.append(100.0 * feats @ classifier)
            targets.extend([ci] * len(batch))
    logits = np.concatenate(logits_all)
    top1, top5 = accuracy(logits, np.asarray(targets), topk=(1, 5))
    print(f"imagenet zero-shot: top1 {top1:.4f} top5 {top5:.4f} "
          f"({len(targets)} images, {len(dirs)} classes)")
    return {"imagenet-zeroshot-val-top1": top1,
            "imagenet-zeroshot-val-top5": top5}


def evaluate(checkpoint: str, dataset: str, model_name: str = "daclip_ViT-B-32",
             batch_size: int = 64, max_per_class=None, classnames=None):
    """Checkpoint-based CLI entry (builds a DaCLIP from a torch checkpoint)."""
    import jax
    import jax.numpy as jnp

    from daclip_tpu.models import CLIPCfg, DaCLIP, get_model_config
    from daclip_tpu.utils.torch_convert import (convert_daclip, convert_clip,
                                                load_torch_state_dict)

    cfg = CLIPCfg.from_dict(get_model_config(model_name))
    model = DaCLIP(cfg, dtype=jnp.bfloat16)
    sd = load_torch_state_dict(checkpoint)
    if any(k.startswith("clip.") for k in sd):
        params = {"params": convert_daclip(sd)}
    else:
        init = model.init(jax.random.PRNGKey(0),
                          image=jnp.zeros((1, cfg.vision.image_size,
                                           cfg.vision.image_size, 3)))
        p = dict(init["params"])
        p["clip"] = convert_clip(sd)
        params = {"params": p}

    # params as jit ARGUMENTS (closure constants blow the remote-compile
    # size limit with real-size checkpoints — see pipeline.py)
    _et = jax.jit(lambda p, t: model.apply(p, t, normalize=True,
                                           method=model.encode_text))
    _ei = jax.jit(lambda p, im: model.apply(p, im, normalize=True,
                                            method=model.encode_image))
    encode_text = lambda t: _et(params, t)
    encode_image = lambda im: _ei(params, im)
    return evaluate_with_encoders(encode_image, encode_text, dataset,
                                  cfg.vision.image_size, batch_size,
                                  max_per_class, classnames)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model", default="daclip_ViT-B-32")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--max-per-class", type=int, default=None)
    args = ap.parse_args(argv)
    evaluate(args.checkpoint, args.dataset, args.model, args.batch_size,
             args.max_per_class)


if __name__ == "__main__":
    main()
