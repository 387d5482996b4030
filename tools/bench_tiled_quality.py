"""Measure the QUALITY impact of the adaptive tile grid (ADVICE r3 #1).

The round-3 adaptive grid (`pipeline._adaptive_tile_axis`) keeps the fixed
grid's tile COUNT and blend geometry but shrinks the tile SIZE (1024² input:
3×384 per axis instead of 3×512) — each tile sees less spatial context, so
"same output" was an overstatement.  This tool quantifies the delta with a
model that actually restores:

  1. trains a tiny ConditionalUNet to overfit one synthetic blur+noise pair
     through the REAL cli/train_restoration.py (same recipe as
     tests/test_convergence.py),
  2. restores the full 256² LQ three ways with the trained EMA params —
     untiled (the quality ceiling), fixed 128-tile grid
     (tile_size_buckets=(128,), the r2 geometry), and the adaptive grid
     (96-tiles here — the same 0.75× linear shrink as the headline
     1024²/512→384 case),
  3. reports PSNR vs GT for each.

Runs on CPU (quality is platform-independent); results recorded in
BASELINE.md round 4.  Usage: python -m tools.bench_tiled_quality
"""
import dataclasses
import json
import sys
import tempfile
from pathlib import Path

import numpy as np


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return float(10 * np.log10(1.0 / max(mse, 1e-12)))


def main(steps: int = 1500):
    import cv2
    import jax

    jax.config.update("jax_platforms", "cpu")

    tmp = Path(tempfile.mkdtemp(prefix="tiled_quality_"))
    root = tmp / "data"
    for d in ("GT", "LQ"):
        (root / "noisy" / d).mkdir(parents=True)

    # one 256² pair: smooth random texture GT, blur+noise LQ (fixed params so
    # the tiny net can learn the inverse map) — test_convergence.py recipe at
    # 256² instead of 32²
    rng = np.random.RandomState(0)
    base = cv2.GaussianBlur((rng.rand(256, 256, 3) * 255).astype(np.float32),
                            (0, 0), 6)
    base = (base - base.min()) / (np.ptp(base) + 1e-9) * 255
    gt = np.clip(base, 0, 255).astype(np.uint8)
    lq = np.clip(cv2.GaussianBlur(gt.astype(np.float32), (0, 0), 1.2)
                 + rng.randn(256, 256, 3) * 15, 0, 255).astype(np.uint8)
    cv2.imwrite(str(root / "noisy" / "GT" / "0.png"), gt)
    cv2.imwrite(str(root / "noisy" / "LQ" / "0.png"), lq)

    yml = tmp / "train.yml"
    yml.write_text(f"""\
name: tiled_quality
model: denoising
distortion: [noisy]
gpu_ids: [0]
sde: {{max_sigma: 50, T: 100, schedule: cosine, eps: 0.005}}
datasets:
  train: {{name: T, mode: MD, dataroot: {root}, batch_size: 8, patch_size: 64,
           use_shuffle: true, n_workers: 0, use_flip: false, use_rot: false}}
  val: {{name: V, mode: MD, dataroot: {root}}}
network_G:
  which_model_G: ConditionalUNet
  setting: {{in_nc: 3, out_nc: 3, nf: 16, ch_mult: [1, 2], context_dim: ~,
             use_degra_context: false, use_image_context: false}}
path: {{pretrain_model_G: ~, root: {tmp}}}
train: {{optimizer: AdamW, lr_G: !!float 2e-3, lr_scheme: TrueCosineAnnealingLR,
         beta1: 0.9, beta2: 0.99, niter: {steps}, warmup_iter: -1,
         eta_min: !!float 1e-5, loss_type: l1, manual_seed: 0,
         val_freq: {steps}, ema_beta: 0.9, ema_update_every: 1}}
logger: {{print_freq: 250, save_checkpoint_freq: {steps}}}
""")
    from daclip_tpu.cli.train_restoration import main as train_main
    train_main(["-opt", str(yml)])
    ckpt = tmp / "experiments" / "tiled_quality" / "training_state"

    from daclip_tpu.pipeline import DACLIPRestorer, RestorerConfig

    gt_f = gt[:, :, ::-1].astype(np.float32) / 255.0   # BGR file -> RGB
    lq_f = lq[:, :, ::-1].astype(np.float32) / 255.0
    base_cfg = RestorerConfig(T=100, buckets_step=16, tile_overlap=16,
                              tile_batch=8, dtype="float32")
    modes = {
        # untiled ceiling: whole image in one sampler call
        "untiled": dict(tile_size=256),
        # r2 fixed grid: 3x3 tiles of exactly tile_size
        "fixed_128": dict(tile_size=128, tile_size_buckets=(128,)),
        # r3 adaptive grid, unsnapped: 3x3 tiles of 96 (0.75x linear, the same
        # shrink ratio as the headline 1024² 512->384 case)
        "adaptive_96": dict(tile_size=128, tile_size_buckets=()),
    }
    out = {"lq_psnr": round(_psnr(lq_f, gt_f), 2)}
    for name, kw in modes.items():
        r = DACLIPRestorer.from_train_dir(
            str(ckpt), daclip=None,
            cfg=dataclasses.replace(base_cfg, **kw))
        rec = r.restore(lq_f, seed=1, return_uint8=False)
        out[name + "_psnr"] = round(_psnr(rec, gt_f), 2)
        print(f"{name}: {out[name + '_psnr']} dB", file=sys.stderr)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500)
