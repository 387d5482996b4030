"""Host input-pipeline bench: folder JPEG decode → 256² train crop, the
decode-bound path from BASELINE.md (63.9 samples/s cv2 on this 1-core host vs
a 60.5 samples/s trainer).

Builds a small synthetic 512² JPEG corpus in a tmpdir and measures
samples/sec for: (a) the cv2 full-decode + numpy-crop reference path,
(b) native full decode, (c) native crop-at-decode (only the cropped window's
JPEG rows/iMCU columns go through the IDCT), (d) native batched
crop-at-decode over the pthread pool.

  python -m tools.bench_input [--n 64] [--size 512] [--crop 256] [--threads N]
"""
from __future__ import annotations

import argparse
import os
import random
import tempfile
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--threads", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)

    import cv2

    from daclip_tpu.data import native_io

    tmp = tempfile.mkdtemp(prefix="daclip_bench_input_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(args.n):
        img = (rng.random((args.size, args.size, 3)) * 255).astype(np.uint8)
        p = os.path.join(tmp, f"{i:04d}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(p)
    datas = [open(p, "rb").read() for p in paths]
    prng = random.Random(0)
    S, C = args.size, args.crop
    crops = [(prng.randint(0, S - C), prng.randint(0, S - C)) for _ in paths]

    def timed(name, fn):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            fn()
        dt = (time.perf_counter() - t0) / args.reps
        print(f"{name:38s} {args.n / dt:8.1f} samples/s")

    def cv2_path():
        for p, (x, y) in zip(paths, crops):
            img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
            _ = img[y:y + C, x:x + C].astype(np.float32) / 255.0

    def native_full():
        for d, (x, y) in zip(datas, crops):
            img = native_io.decode(d)
            _ = img[y:y + C, x:x + C].astype(np.float32) / 255.0

    def native_crop():
        for d, (x, y) in zip(datas, crops):
            _ = native_io.decode(d, crop=(x, y, C, C)).astype(np.float32) / 255.0

    def native_batch():
        outs = native_io.decode_batch(
            datas, crops=[(x, y, C, C) for x, y in crops],
            threads=args.threads or None)
        for o in outs:
            _ = o.astype(np.float32) / 255.0

    print(f"{args.n} x {S}^2 JPEG -> {C}^2 crop, reps={args.reps}, "
          f"native available={native_io.available()}")
    timed("cv2 full decode + crop (reference)", cv2_path)
    timed("native full decode + crop", native_full)
    timed("native crop-at-decode", native_crop)
    timed("native batched crop-at-decode", native_batch)


if __name__ == "__main__":
    main()
