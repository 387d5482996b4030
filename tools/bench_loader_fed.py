"""END-TO-END (loader-fed) training throughput: loader → device_put → step.

BASELINE.md's training numbers are device-step timings with device-resident
synthetic batches; this tool measures the REAL loop the way a user runs it —
the host dataloader (decode/crop/augment/synthesis) feeding double-buffered
device puts feeding the jitted train step — and reports sustained samples/s
so input-boundedness is measured, not asserted.

Configs:
  md    — paired-folder MD dataset (decode+crop), context-free UNet, B16/256²
          (the daclip-sde restoration trainer shape)
  mdgt  — GT-only + on-the-fly random_degrade (wild-ir trainer feed,
          train.yml:26), B32/256²; --lq-cache N exercises the synthesis cache
  mdgt-cache — mdgt with lq_cache=4*B, refresh 0.25
  csv   — DA-CLIP fork trainer fed by the real CsvDataset --da pipeline
          (decode LQ+GT pairs, 224² transform, 154-token captions, bin/token
          banks), frozen ViT-B-32 + controller + predictor, B128

Timing discipline (axon tunnel): every timed window ends in a host read of
the step loss; batches differ step to step so no result caching applies.

  python -m tools.bench_loader_fed [--config md|mdgt|mdgt-cache|all]
       [--steps 30] [--corpus 48] [--img 512] [--patch 256] [--workers 8]
"""
from __future__ import annotations

import argparse
import os
import tempfile
import time


def make_corpus(n, size, paired):
    import cv2
    import numpy as np

    root = tempfile.mkdtemp(prefix="daclip_loaderfed_")
    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "GT"))
    if paired:
        os.makedirs(os.path.join(root, "LQ"))
    for i in range(n):
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "GT", f"{i:04d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        if paired:
            lq = cv2.GaussianBlur(img, (0, 0), 1.5)
            cv2.imwrite(os.path.join(root, "LQ", f"{i:04d}.jpg"), lq,
                        [cv2.IMWRITE_JPEG_QUALITY, 92])
    return root


def make_csv_corpus(n, size):
    """LQ/GT jpeg pairs + the reference TSV layout (filepath, title with
    'caption| <type> with parameter <p>' — training/data.py:52-61)."""
    import cv2
    import numpy as np

    root = tempfile.mkdtemp(prefix="daclip_loaderfed_csv_")
    os.makedirs(os.path.join(root, "LQ"))
    os.makedirs(os.path.join(root, "GT"))
    rng = np.random.default_rng(0)
    degs = [("blur", "2.0"), ("noisy", "20.0"), ("jpeg", "40.0"),
            ("resize", "2.0")]
    rows = []
    for i in range(n):
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(root, "GT", f"{i:04d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 92])
        lq = cv2.GaussianBlur(img, (0, 0), 1.5)
        path = os.path.join(root, "LQ", f"{i:04d}.jpg")
        cv2.imwrite(path, lq, [cv2.IMWRITE_JPEG_QUALITY, 92])
        d, p = degs[i % len(degs)]
        rows.append(f"{path}\ta photo of sample {i}| {d} with parameter {p}")
    tsv = os.path.join(root, "train.tsv")
    with open(tsv, "w") as f:
        f.write("filepath\ttitle\n" + "\n".join(rows) + "\n")
    return tsv


def run_csv_config(args):
    """Loader-fed DA-CLIP trainer: CsvDataset --da → DataLoader →
    device_prefetch → the production fork train step (frozen ViT-B-32 +
    controller + predictor, same construction as tools/profile_clip_train)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from daclip_tpu.data.csv_dataset import CsvDataset
    from daclip_tpu.data.loader import DataLoader, device_prefetch
    from daclip_tpu.factory import create_model_and_transforms
    from daclip_tpu.train.clip_train import (ClipTrainConfig, init_state,
                                             make_train_step,
                                             partition_daclip_params)

    B = 128  # 1100 samples/s device rate at B128 no-remat (BASELINE.md)
    # the corpus must cover at least a few FULL batches — the loader drops
    # incomplete tails, and a corpus < B would yield zero batches per epoch
    # (prefetch would then block forever before the first compile)
    tsv = make_csv_corpus(max(args.corpus, 3 * B), 256)
    print("csv corpus ready; building model + compiling the fork step...")
    model, params, pp_train, _ = create_model_and_transforms(
        "daclip_ViT-B-32", precision="bf16", use_predictor=True)
    ds = CsvDataset(tsv, pp_train, da=True, seed=0)
    banks = tuple(jnp.asarray(b) for b in ds.banks())
    loader = DataLoader(ds, batch_size=B, shuffle=True,
                        num_workers=args.workers, seed=0)

    trainable, frozen = partition_daclip_params(params)
    cfg = ClipTrainConfig(variant="fork")
    # jit here exactly like cli/train_daclip.py does — make_train_step
    # returns the UNJITTED step (frozen params must enter as jit arguments)
    step_fn = jax.jit(make_train_step(model.apply, None, cfg, banks=banks))
    state = init_state(trainable, cfg)

    def batches():
        epoch = 0
        while True:
            loader.set_epoch(epoch)
            for b in loader:
                yield {k: np.ascontiguousarray(v) for k, v in b.items()}
            epoch += 1

    it = device_prefetch(batches())
    for _ in range(3):
        state, m = step_fn(state, next(it), frozen=frozen)
    _ = float(m["total_loss"])  # host read: warmup (incl. compile) done

    t0 = time.time()
    for _ in range(args.steps):
        state, m = step_fn(state, next(it), frozen=frozen)
    loss = float(m["total_loss"])  # host read ends the timed window
    dt = time.time() - t0
    sps = args.steps * B / dt
    print(f"csv: {sps:.1f} samples/s sustained loader-fed "
          f"({args.steps} steps x B{B} 224^2 in {dt:.1f}s, "
          f"workers={args.workers}, final loss {loss:.4f})")
    return sps


def run_config(name, args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from daclip_tpu.data import DataLoader, IterSampler, create_dataset
    from daclip_tpu.data.loader import device_prefetch
    from daclip_tpu.models.unet import ConditionalUNet
    from daclip_tpu.sde import IRSDE
    from daclip_tpu.train.restoration import (RestorationTrainConfig,
                                              init_state, make_train_step)

    if name == "md":
        B = 16
        root = make_corpus(args.corpus, args.img, paired=True)
        ds = create_dataset({"mode": "MD", "dataroot": os.path.dirname(root),
                             "distortion": [os.path.basename(root)],
                             "phase": "train", "patch_size": args.patch,
                             "use_flip": True, "use_rot": True, "seed": 0})
    else:
        B = 32
        root = make_corpus(args.corpus, args.img, paired=False)
        opt = {"mode": "MDGT", "phase": "train", "patch_size": args.patch,
               "dataroot_GT": os.path.join(root, "GT"),
               "use_flip": True, "use_rot": True, "seed": 0}
        if name == "mdgt-cache":
            opt["lq_cache"] = (args.lq_cache or 4 * B)
            opt["lq_cache_refresh"] = 0.25
        ds = create_dataset(opt)

    sampler = IterSampler(len(ds), ratio=200)
    loader = DataLoader(ds, batch_size=B, sampler=sampler,
                        num_workers=args.workers)

    # remat mirrors cli/train_restoration.py (auto-on at patch >= 256): the
    # production trainer never runs 256² without it.  The mdgt configs model
    # the wild-ir trainer (MDGT feed, train.yml:26) so they use its scale-0.5
    # arch — the full-res arch at B32 exceeds HBM (BASELINE.md batch sweep).
    unet = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 8), context_dim=None,
                           use_degra_context=False, use_image_context=False,
                           scale=1.0 if name == "md" else 0.5,
                           remat=args.patch >= 256, dtype=jnp.bfloat16)
    sde = IRSDE(max_sigma=50, T=100)
    cfg = RestorationTrainConfig(optimizer="AdamW", lr_G=2e-4, niter=10_000)
    x0 = jnp.zeros((B, args.patch, args.patch, 3))
    params = unet.init(jax.random.PRNGKey(0), x0, x0, jnp.ones((B,)),
                       None, None)
    state = init_state(params, cfg)
    step_fn = jax.jit(make_train_step(unet.apply, sde, cfg))

    def batches():
        epoch = 0
        while True:
            loader.set_epoch(epoch)
            for b in loader:
                yield {k: np.ascontiguousarray(v) for k, v in b.items()
                       if k in ("LQ", "GT")}
            epoch += 1

    it = device_prefetch(batches())
    key = jax.random.PRNGKey(7)
    # warmup: compile + first batches (excluded from the timing)
    for i in range(3):
        state, m = step_fn(state, next(it), jax.random.fold_in(key, i))
    _ = float(m["loss"])  # host read: all warmup work done

    t0 = time.time()
    for i in range(args.steps):
        state, m = step_fn(state, next(it), jax.random.fold_in(key, 100 + i))
    loss = float(m["loss"])  # host read ends the timed window honestly
    dt = time.time() - t0
    sps = args.steps * B / dt
    print(f"{name}: {sps:.1f} samples/s sustained loader-fed "
          f"({args.steps} steps x B{B} {args.patch}^2 in {dt:.1f}s, "
          f"workers={args.workers}, final loss {loss:.4f})")
    return sps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="all",
                    choices=["md", "mdgt", "mdgt-cache", "csv", "all"])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--corpus", type=int, default=48)
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--lq-cache", type=int, default=0)
    args = ap.parse_args(argv)
    names = (["md", "mdgt", "mdgt-cache", "csv"] if args.config == "all"
             else [args.config])
    for n in names:
        run_csv_config(args) if n == "csv" else run_config(n, args)


if __name__ == "__main__":
    main()
