"""Zero-shot degradation classification eval — da-clip/src/evaluate_daclip.py
parity (:32-218): classify LQ images into fine classes (directory names under the
dataset root, e.g. blur05, noisy25, ...) and base classes (the alpha prefix),
from the controller's degradation features.

Usage:
  python -m daclip_tpu.eval.evaluate_daclip --dataset path/to/test \
      --checkpoint pretrained/daclip_ViT-B-32.pt [--model daclip_ViT-B-32]
Outputs per-class accuracy, base-class accuracy, and a confusion-matrix CSV.
"""
from __future__ import annotations

import argparse
import os
import re
from collections import defaultdict

import numpy as np


def evaluate_checkpoint(checkpoint_path: str, dataset_path: str,
                        model_name: str = "daclip_ViT-B-32",
                        batch_size: int = 32, out_dir: str = "eval_results",
                        max_per_class: int = None):
    import jax
    import jax.numpy as jnp

    from daclip_tpu.models import CLIPCfg, DaCLIP, get_model_config
    from functools import partial

    from daclip_tpu.tokenizer import tokenize as _tokenize
    from daclip_tpu.transforms import clip_transform
    from daclip_tpu.utils.torch_convert import (convert_daclip,
                                                load_torch_state_dict)
    from daclip_tpu.data.util import read_img

    classes = sorted(c for c in os.listdir(dataset_path)
                     if os.path.isdir(os.path.join(dataset_path, c)))
    base_class_map = {c: re.match(r"[a-zA-Z-]+", c).group() for c in classes}
    base_classes = sorted(set(base_class_map.values()))

    cfg = CLIPCfg.from_dict(get_model_config(model_name))
    tokenize = partial(_tokenize, context_length=cfg.text.context_length)
    model = DaCLIP(cfg, dtype=jnp.bfloat16)
    params = {"params": convert_daclip(load_torch_state_dict(checkpoint_path))}

    encode_text = jax.jit(lambda toks: model.apply(
        params, toks, normalize=True, method=model.encode_text))
    encode_image = jax.jit(lambda imgs: model.apply(
        params, imgs, control=True, normalize=True, method=model.encode_image))

    tf_full = np.asarray(encode_text(jnp.asarray(tokenize(classes))),
                         np.float32)
    tf_base = np.asarray(encode_text(jnp.asarray(tokenize(base_classes))),
                         np.float32)

    res = int(cfg.vision.image_size)
    gt, pred, pred_base_ok = [], [], []
    per_class = defaultdict(lambda: [0, 0])
    for ci, cname in enumerate(classes):
        cdir = os.path.join(dataset_path, cname, "LQ")
        if not os.path.isdir(cdir):
            cdir = os.path.join(dataset_path, cname)
        files = sorted(os.listdir(cdir))[:max_per_class]
        for i in range(0, len(files), batch_size):
            batch = []
            for f in files[i: i + batch_size]:
                img = read_img(None, os.path.join(cdir, f))[:, :, ::-1]
                batch.append(clip_transform(img, res))
            if not batch:
                continue
            _, degra = encode_image(jnp.asarray(np.stack(batch)))
            degra = np.asarray(degra, np.float32)
            logits = 100.0 * degra @ tf_full.T
            p = logits.argmax(-1)
            logits_b = 100.0 * degra @ tf_base.T
            pb = logits_b.argmax(-1)
            for k in range(len(batch)):
                gt.append(ci)
                pred.append(int(p[k]))
                per_class[cname][1] += 1
                per_class[cname][0] += int(p[k] == ci)
                pred_base_ok.append(
                    base_classes[int(pb[k])] == base_class_map[cname])

    acc = float(np.mean(np.asarray(gt) == np.asarray(pred))) if gt else 0.0
    base_acc = float(np.mean(pred_base_ok)) if pred_base_ok else 0.0
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "per_class_accuracy.csv"), "w") as f:
        f.write("class,correct,total,accuracy\n")
        for c, (ok, tot) in sorted(per_class.items()):
            f.write(f"{c},{ok},{tot},{ok / max(tot, 1):.4f}\n")
    # confusion matrix
    cm = np.zeros((len(classes), len(classes)), np.int64)
    for g, p in zip(gt, pred):
        cm[g, p] += 1
    np.savetxt(os.path.join(out_dir, "confusion_matrix.csv"), cm, fmt="%d",
               delimiter=",", header=",".join(classes))
    print(f"fine-class accuracy: {acc:.4f} ({len(classes)} classes)")
    print(f"base-class accuracy: {base_acc:.4f} ({len(base_classes)} classes)")
    return {"accuracy": acc, "base_accuracy": base_acc,
            "per_class": dict(per_class)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--model", default="daclip_ViT-B-32")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--out-dir", default="eval_results")
    p.add_argument("--max-per-class", type=int, default=None)
    args = p.parse_args(argv)
    evaluate_checkpoint(args.checkpoint, args.dataset, args.model,
                        args.batch_size, args.out_dir, args.max_per_class)


if __name__ == "__main__":
    main()
