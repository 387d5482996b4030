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
                    choices=["md", "mdgt", "mdgt-cache", "all"])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--corpus", type=int, default=48)
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--lq-cache", type=int, default=0)
    args = ap.parse_args(argv)
    names = (["md", "mdgt", "mdgt-cache"] if args.config == "all"
             else [args.config])
    for n in names:
        run_config(n, args)


if __name__ == "__main__":
    main()
