"""Encode a folder of images with a DA-CLIP checkpoint into the .npy
embedding-dump layout consumed by tools/visualize.py.

This is the front half of every reference visualization script
(da-clip/src/visualize_same_image_diff_level.py:34-74,
 visualize/visualize_diff_param.py, visualize_cosine_similarity.py): load a
checkpoint, preprocess + encode each image in a folder with
`encode_image(control=True)`, L2-normalize, and collect the features; the
back half (t-SNE/UMAP/cosine heatmap/monotonicity) is `tools/visualize.py`
over the dump this writes.

Layouts:
  * flat folder: every image file directly in --input; label = filename stem
    (the reference's same-image-different-level folders, one file per level).
  * nested: --input/<label>/*.png — label = subfolder name (one level deep),
    like the generate_lq.py class trees.

Writes to --out: all_embeddings.npy (the --features choice), labels.npy,
filenames.npy, plus both raw dumps (degra_embeddings.npy,
image_embeddings.npy).  Checkpoints may be torch .pt, an orbax train dir, or
a flat .npz — the native paths need no torch (utils/native_checkpoint.py).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _collect(root: str):
    """(path, label, filename) triples: flat folder or one-deep class tree."""
    entries = sorted(os.listdir(root))
    files = [e for e in entries if e.lower().endswith(IMG_EXTS)]
    if files:
        return [(os.path.join(root, f), os.path.splitext(f)[0], f)
                for f in files]
    out = []
    for sub in entries:
        subdir = os.path.join(root, sub)
        # generate_lq.py trees keep images under <class>/LQ
        if os.path.isdir(os.path.join(subdir, "LQ")):
            subdir = os.path.join(subdir, "LQ")
        if not os.path.isdir(subdir):
            continue
        for f in sorted(os.listdir(subdir)):
            if f.lower().endswith(IMG_EXTS):
                out.append((os.path.join(subdir, f), sub, f))
    return out


def encode_folder(checkpoint: str, input_dir: str, out_dir: str,
                  model_name: str = "daclip_ViT-B-32", batch_size: int = 32,
                  features: str = "degra"):
    import jax
    import jax.numpy as jnp

    from daclip_tpu.data.util import read_img
    from daclip_tpu.models import CLIPCfg, DaCLIP, get_model_config
    from daclip_tpu.transforms import clip_transform
    from daclip_tpu.utils.native_checkpoint import load_daclip_any

    cfg = CLIPCfg.from_dict(get_model_config(model_name))
    model = DaCLIP(cfg, use_predictor=False, dtype=jnp.bfloat16)
    params_tree = load_daclip_any(
        checkpoint, cfg.vision.image_size,
        cfg.vision.patch_size if not cfg.vision.is_resnet else None)
    params = {"params": params_tree}
    # params as jit ARGUMENTS, not closure constants (remote-compile limit)
    _ei = jax.jit(lambda p, imgs: model.apply(
        p, imgs, control=True, normalize=True, method=model.encode_image))

    items = _collect(input_dir)
    if not items:
        raise SystemExit(f"no images found under {input_dir}")
    res = int(cfg.vision.image_size)
    img_feats, deg_feats = [], []
    for i in range(0, len(items), batch_size):
        chunk = items[i: i + batch_size]
        batch = np.stack([clip_transform(read_img(None, p)[:, :, ::-1], res)
                          for p, _, _ in chunk])
        imf, degf = _ei(params, jnp.asarray(batch))
        img_feats.append(np.asarray(imf, np.float32))
        deg_feats.append(np.asarray(degf, np.float32))
    img_feats = np.concatenate(img_feats, 0)
    deg_feats = np.concatenate(deg_feats, 0)
    labels = np.asarray([lab for _, lab, _ in items])
    fnames = np.asarray([f for _, _, f in items])

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "degra_embeddings.npy"), deg_feats)
    np.save(os.path.join(out_dir, "image_embeddings.npy"), img_feats)
    chosen = deg_feats if features == "degra" else img_feats
    np.save(os.path.join(out_dir, "all_embeddings.npy"), chosen)
    np.save(os.path.join(out_dir, "labels.npy"), labels)
    np.save(os.path.join(out_dir, "filenames.npy"), fnames)
    return len(items)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="image folder (flat, or one-deep <label>/ tree)")
    ap.add_argument("--checkpoint", required=True,
                    help="torch .pt, orbax train dir, or flat .npz")
    ap.add_argument("--model", default="daclip_ViT-B-32")
    ap.add_argument("--out", default="embeddings")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--features", default="degra", choices=["degra", "image"],
                    help="which tower output all_embeddings.npy holds")
    args = ap.parse_args(argv)
    n = encode_folder(args.checkpoint, args.input, args.out, args.model,
                      args.batch_size, args.features)
    print(f"encoded {n} images -> {args.out}")


if __name__ == "__main__":
    main()
