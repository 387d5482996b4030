"""Tiled-restore quality: fixed vs adaptive tile grid (ADVICE r3 #1).

The adaptive tile grid (pipeline._adaptive_tile_axis) keeps the fixed grid's
tile COUNT and feathered blend geometry but shrinks the tile size (512 -> 384
for 1024-px inputs), so each tile sees less spatial context.  The latency win
is measured (BASELINE.md round 3: 27.6 -> 10.6 s at T=100); this tool measures
the QUALITY side on a scaled analog, since the released production weights
cannot be downloaded here (tests/parity/EGRESS.md):

  1. train a small context-free UNet on a synthetic blur+noise set through the
     REAL train CLI (the tests/test_convergence.py recipe: overfit a tiny set,
     validate HELD-IN — training sees random 32x32 crops, never the full
     image, so full-image tiled restore still exercises fresh geometry),
  2. restore a 96x96 training image at full size through DACLIPRestorer three
     ways — untiled (full 96 context), fixed 3x3 grid of 48-px tiles,
     adaptive 3x3 grid of 40-px tiles (the same ~0.8x linear shrink as
     512 -> 384),
  3. report PSNR vs GT for each and the fixed-vs-adaptive agreement PSNR.

Geometry analog: D=96, ts=48, ov=8, step=8 -> n=3, adaptive t=40 per axis —
the 1024/512/64/64 case scaled by ~10.7x.  Run on CPU (~4-6 min, dominated by
training):
    python -m tools.measure_tiled_quality [--niter 2000] [--workdir DIR]
"""

import argparse
import dataclasses
import pathlib
import tempfile

import numpy as np


def _psnr(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def make_image(rng, size=96):
    """Smooth random blobs, the convergence-suite image family."""
    import cv2
    base = cv2.GaussianBlur((rng.rand(size, size, 3) * 255).astype(np.float32),
                            (0, 0), 6)
    base = (base - base.min()) / max(float(np.ptp(base)), 1e-6) * 255
    return np.clip(base, 0, 255).astype(np.uint8)


def degrade(rng, gt):
    import cv2
    blurred = cv2.GaussianBlur(gt.astype(np.float32), (0, 0), 1.0)
    return np.clip(blurred + rng.randn(*gt.shape) * 20, 0, 255).astype(np.uint8)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--niter", type=int, default=2000)
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args(argv)

    import cv2
    import jax
    if jax.default_backend() not in ("tpu",):  # tiny model: CPU is fine
        jax.config.update("jax_platforms", "cpu")

    work = pathlib.Path(args.workdir or tempfile.mkdtemp(prefix="tiledq_"))
    root = work / "data"
    for d in ("GT", "LQ"):
        (root / "noisy" / d).mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    val_gt = val_lq = None
    for i in range(2):
        gt = make_image(rng, args.size)
        lq = degrade(rng, gt)
        cv2.imwrite(str(root / "noisy" / "GT" / f"{i}.png"), gt)
        cv2.imwrite(str(root / "noisy" / "LQ" / f"{i}.png"), lq)
        if i == 0:  # held-in eval pair (training only sees 32x32 crops of it)
            val_gt, val_lq = gt, lq

    yml = work / "train.yml"
    yml.write_text(f"""\
name: tiledq
model: denoising
distortion: [noisy]
gpu_ids: [0]
sde: {{max_sigma: 50, T: 100, schedule: cosine, eps: 0.005}}
datasets:
  train: {{name: T, mode: MD, dataroot: {root}, batch_size: 8, patch_size: 32,
           use_shuffle: true, n_workers: 0, use_flip: true, use_rot: true}}
  val: {{name: V, mode: MD, dataroot: {root}}}
network_G:
  which_model_G: ConditionalUNet
  setting: {{in_nc: 3, out_nc: 3, nf: 16, ch_mult: [1, 2], context_dim: ~,
             use_degra_context: false, use_image_context: false}}
path: {{pretrain_model_G: ~, root: {work}}}
train: {{optimizer: AdamW, lr_G: !!float 2e-3, lr_scheme: TrueCosineAnnealingLR,
         beta1: 0.9, beta2: 0.99, niter: {args.niter}, warmup_iter: -1,
         eta_min: !!float 1e-5, loss_type: l1, weight: 1.0, manual_seed: 0,
         val_freq: 500, ema_beta: 0.9, ema_update_every: 1}}
logger: {{print_freq: 500, save_checkpoint_freq: 1000000}}
""")
    ckpt_dir = str(work / "experiments" / "tiledq" / "training_state")
    if not pathlib.Path(ckpt_dir).is_dir():
        from daclip_tpu.cli.train_restoration import main as train_main
        print(f"training {args.niter} steps (workdir {work}) ...", flush=True)
        res = train_main(["-opt", str(yml)])
        print(f"in-training best EMA val PSNR: {res['best_psnr']:.2f} dB "
              f"@ step {res['best_step']}", flush=True)
    else:
        print(f"reusing checkpoint at {ckpt_dir}", flush=True)

    from daclip_tpu.pipeline import DACLIPRestorer, RestorerConfig
    ts, ov, step = args.size // 2, 8, 8
    grids = {
        # single tile: every pixel sees the full image — the context ceiling
        "untiled": dict(tile_size=args.size, tile_overlap=ov,
                        buckets_step=step, tile_size_buckets=(args.size,)),
        # fixed grid: 3x3 tiles of ts (the pre-adaptive r2 geometry)
        "fixed": dict(tile_size=ts, tile_overlap=ov, buckets_step=step,
                      tile_size_buckets=(ts,)),
        # adaptive grid: same 3x3 count, tiles shrink to the minimum
        # step-multiple (40 for 96/48/8) — the production 512->384 analog
        "adaptive": dict(tile_size=ts, tile_overlap=ov, buckets_step=step,
                         tile_size_buckets=tuple(range(step, ts + 1, step))),
    }
    outs, results = {}, {}
    for name, g in grids.items():
        cfg = RestorerConfig(T=100, dtype="float32", **g)
        r = DACLIPRestorer.from_train_dir(ckpt_dir, cfg=cfg)
        # return_uint8=True would give BGR (reference-parity cv2 output);
        # compare in the input's own channel order instead
        out = r.restore(val_lq.astype(np.float32) / 255.0, seed=7,
                        return_uint8=False) * 255.0
        outs[name] = out
        results[name] = _psnr(out, val_gt)
        print(f"{name:9s}: PSNR vs GT = {results[name]:.2f} dB", flush=True)
    print(f"LQ input  : PSNR vs GT = {_psnr(val_lq, val_gt):.2f} dB")
    print(f"fixed vs adaptive agreement: "
          f"{_psnr(outs['fixed'], outs['adaptive']):.2f} dB")
    print(f"fixed    vs untiled: {_psnr(outs['fixed'], outs['untiled']):.2f} dB")
    print(f"adaptive vs untiled: {_psnr(outs['adaptive'], outs['untiled']):.2f} dB")
    return results


if __name__ == "__main__":
    main()
