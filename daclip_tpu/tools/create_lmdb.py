"""Pack an image folder into a BasicSR-style lmdb for fast training IO.

The reference consumes lmdbs (data/LQGT_dataset.py:33-74, data/util.py:32-65)
but ships no creation script; this is the standard companion tool.  Values are
raw uint8 HWC (BGR) bytes, keys are image basenames, shapes go to
meta_info.pkl as 'C_H_W' strings — exactly the layout _read_img_lmdb expects.

Usage: python -m daclip_tpu.tools.create_lmdb --input <img_dir> --output <env_dir>
"""
from __future__ import annotations

import argparse
import os
import pickle


def create_lmdb(input_dir: str, output_dir: str, verbose: bool = True):
    import cv2

    from daclip_tpu.data.lmdb import LmdbWriter
    from daclip_tpu.data.util import get_paths_from_images

    paths = sorted(get_paths_from_images(input_dir))
    # keys are extension-less basenames (the reference's meta_info convention);
    # the recursive walk can produce duplicates (a/0001.png vs b/0001.png) —
    # fall back to relative paths so nothing silently overwrites
    base_keys = [os.path.splitext(os.path.basename(p))[0] for p in paths]
    if len(set(base_keys)) != len(base_keys):
        base_keys = [os.path.splitext(os.path.relpath(p, input_dir))[0]
                     .replace(os.sep, "/") for p in paths]
    keys, sizes = [], []
    os.makedirs(output_dir, exist_ok=True)
    with LmdbWriter(output_dir) as w:
        for i, (p, key) in enumerate(zip(paths, base_keys)):
            img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
            if img is None:
                raise FileNotFoundError(p)
            if img.ndim == 2:
                img = img[:, :, None]
            H, W, C = img.shape
            w.put(key, img.tobytes())
            keys.append(key)
            sizes.append(f"{C}_{H}_{W}")
            if verbose and (i + 1) % 500 == 0:
                print(f"  packed {i + 1}/{len(paths)}")
    with open(os.path.join(output_dir, "meta_info.pkl"), "wb") as f:
        pickle.dump({"name": os.path.basename(output_dir.rstrip("/")),
                     "keys": keys, "resolution": sizes}, f)
    if verbose:
        print(f"wrote {len(keys)} images -> {output_dir}")
    return keys, sizes


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="image folder")
    ap.add_argument("--output", required=True, help="lmdb env dir to create")
    args = ap.parse_args(argv)
    create_lmdb(args.input, args.output)


if __name__ == "__main__":
    main()
