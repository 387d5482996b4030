"""Offline LQ generator — universal-image-restoration/generate_LQ.py parity
(:19-141): per-level degraded folders <save>/<mode>/<type><p>/{GT,LQ} plus a
degraded_prompts.json of "«type» with parameter «p»" strings.

Level grids (also encoded in training/data.py:71-78 and evaluate_numclip.py):
blur/resize 0.5–4.0, noisy 5–40, jpeg 10–80; grid points at multiples of 10 of
the raw range are skipped exactly like the reference (:27-28).

  python -m daclip_tpu.tools.generate_lq --source imgs/ --save out/ \
      --deg-type noisy --mode train --epochs 1
"""
from __future__ import annotations

import argparse
import json
import os
import random

import numpy as np

from daclip_tpu.data.degradations import degrade, match_dim
from daclip_tpu.data.util import IMG_EXTENSIONS

DEFAULT_PARAMS = {
    "noisy": [1, 40, 1],
    "resize": [1, 40, 1],
    "blur": [1, 40, 1],
    "jpeg": [10, 80, 10],
}


def generate_LQ(source_dirs, deg_type="blur", param=None, save_path="./dataset/",
                epochs=1, mode="train", crop=(512, 512), seed=None):
    import cv2

    rng = random.Random(seed)
    param = param or DEFAULT_PARAMS[deg_type]
    filepaths = [os.path.join(s, f) for s in source_dirs
                 for f in sorted(os.listdir(s)) if f.endswith(IMG_EXTENSIONS)]
    for p_raw in range(param[0], param[1] + 1, param[2]):
        if deg_type != "jpeg" and p_raw % 10 == 0:
            continue  # generate_LQ.py:27-28
        p = p_raw / 10.0 if deg_type in ("blur", "resize") else p_raw
        savedir_GT = f"{save_path}/{mode}/{deg_type}{p}/GT"
        savedir_LQ = f"{save_path}/{mode}/{deg_type}{p}/LQ"
        os.makedirs(savedir_GT, exist_ok=True)
        os.makedirs(savedir_LQ, exist_ok=True)
        degraded_prompts = {}
        for epoch in range(epochs):
            for filename in filepaths:
                image = cv2.imread(filename)
                image_GT = match_dim(image, crop, "random", rng)
                image_LQ = (degrade(image_GT / 255.0, deg_type, p, rng)
                            * 255).astype(np.uint8)
                prompt = f"{deg_type} with parameter {p}"
                epoch_filename = f"{epoch}_{os.path.basename(filename)}"
                degraded_prompts["./" + epoch_filename] = prompt
                cv2.imwrite(os.path.join(savedir_GT, epoch_filename), image_GT)
                cv2.imwrite(os.path.join(savedir_LQ, epoch_filename), image_LQ)
        with open(os.path.join(f"{save_path}/{mode}/{deg_type}{p}",
                               "degraded_prompts.json"), "w") as f:
            json.dump(degraded_prompts, f, indent=4)
        print(f"{deg_type}{p}: {len(degraded_prompts)} images")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", nargs="+", required=True)
    ap.add_argument("--save", required=True)
    ap.add_argument("--deg-type", default="blur",
                    choices=["blur", "noisy", "resize", "jpeg"])
    ap.add_argument("--mode", default="train")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--crop", type=int, default=512)
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args(argv)
    generate_LQ(args.source, args.deg_type, None, args.save, args.epochs,
                args.mode, (args.crop, args.crop), args.seed)


if __name__ == "__main__":
    main()
