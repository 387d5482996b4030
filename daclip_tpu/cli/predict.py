"""Single-image / folder restoration CLI — predict.py parity
(reference predict.py:58-91; wild-ir no-GT inference: config/wild-ir/inference.py).

Usage:
  python -m daclip_tpu.cli.predict -i image.png -o out/ \
      --unet pretrained/universal-ir.pth --daclip pretrained/daclip_ViT-B-32.pt
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description="DA-CLIP universal image restoration")
    p.add_argument("-i", "--input", required=True, help="image file or folder")
    p.add_argument("-o", "--output", default="results", help="output folder")
    p.add_argument("--unet", default=None,
                   help="UNet weights: torch .pth, orbax train dir, or .npz")
    p.add_argument("--checkpoint", default=None,
                   help="alias for --unet pointing at an orbax train dir — "
                        "serve a model THIS framework trained (torch-free; "
                        "EMA params by default)")
    p.add_argument("--daclip", default=None,
                   help="DA-CLIP weights: torch .pt, orbax train dir, or .npz;"
                        " omit for context-free UNets")
    p.add_argument("--no-ema", action="store_true",
                   help="serve raw (non-EMA) params from a native train dir")
    p.add_argument("--step", type=int, default=None,
                   help="step to load from a native train dir (default latest)")
    p.add_argument("--model-name", default="daclip_ViT-B-32")
    p.add_argument("--sampling-mode", default="posterior",
                   choices=["posterior", "sde", "ode"])
    p.add_argument("--T", type=int, default=100)
    p.add_argument("--sample-T", type=int, default=-1)
    p.add_argument("--max-sigma", type=float, default=50)
    p.add_argument("--tile-size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--wild-ir", action="store_true",
                   help="wild-ir variant (ViT-L-14 contexts, scale 0.5 UNet)")
    p.add_argument("--classify", action="store_true",
                   help="also print zero-shot degradation classification")
    args = p.parse_args(argv)

    import cv2
    from daclip_tpu.pipeline import DACLIPRestorer, RestorerConfig

    cfg = RestorerConfig(model_name=args.model_name, sampling_mode=args.sampling_mode,
                         T=args.T, sample_T=args.sample_T, max_sigma=args.max_sigma,
                         tile_size=args.tile_size)
    if args.wild_ir:
        cfg = RestorerConfig(model_name="daclip_ViT-L-14", context_dim=768,
                             scale=0.5, spatial_attn_min_level=3,
                             sampling_mode=args.sampling_mode, T=args.T,
                             sample_T=args.sample_T, max_sigma=args.max_sigma,
                             tile_size=args.tile_size)
    unet = args.checkpoint or args.unet
    if not unet:
        p.error("one of --unet / --checkpoint is required")
    restorer = DACLIPRestorer.load(unet, args.daclip, cfg,
                                   use_ema=not args.no_ema, step=args.step)

    paths = ([os.path.join(args.input, f) for f in sorted(os.listdir(args.input))]
             if os.path.isdir(args.input) else [args.input])
    os.makedirs(args.output, exist_ok=True)
    for path in paths:
        img = cv2.imread(path)
        if img is None:
            continue
        rgb = img[:, :, ::-1].astype(np.float32) / 255.0
        if args.classify:
            name, probs = restorer.classify_degradation(rgb)
            top = ", ".join(f"{k}={v:.2f}" for k, v in list(probs.items())[:3])
            print(f"{os.path.basename(path)}: degradation={name} ({top})")
        t0 = time.perf_counter()
        out_bgr = restorer.restore(rgb, seed=args.seed)
        dt = time.perf_counter() - t0
        out_path = os.path.join(args.output, os.path.basename(path))
        cv2.imwrite(out_path, out_bgr)
        print(f"{path} -> {out_path} ({dt:.2f}s)")


if __name__ == "__main__":
    main()
