"""Image IO / augmentation / color utilities (numpy), mirroring
universal-image-restoration/data/util.py semantics:

  read_img       — util.py:68-85: cv2 read, float32 BGR [0,1]
  augment        — util.py:98-116: random hflip + rot90-family
  channel_convert— util.py:166-178
  bgr2ycbcr      — util.py:189-211 (needed for PSNR_Y/SSIM_Y parity)
  imresize_np    — util.py:252-399: MATLAB bicubic with antialiasing
"""
from __future__ import annotations

import os
import random
from typing import List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

IMG_EXTENSIONS = (".jpg", ".JPG", ".jpeg", ".JPEG", ".png", ".PNG", ".ppm",
                  ".PPM", ".bmp", ".BMP", ".tif", ".webp")


def is_image_file(fname: str) -> bool:
    return fname.endswith(IMG_EXTENSIONS)


def get_paths_from_images(path: str) -> List[str]:
    assert os.path.isdir(path), f"{path} is not a valid directory"
    images = []
    for dirpath, _, fnames in sorted(os.walk(path)):
        for fname in sorted(fnames):
            if is_image_file(fname):
                images.append(os.path.join(dirpath, fname))
    assert images, f"{path} has no valid image file"
    return images


def get_image_paths(data_type: Optional[str], dataroot: Optional[str]):
    """util.py:42-54: 'img' → sorted file list; 'lmdb' → (keys, sizes) from
    meta_info.pkl (util.py:32-39)."""
    if dataroot is None:
        return None
    if data_type in (None, "img"):
        return sorted(get_paths_from_images(dataroot))
    if data_type == "lmdb":
        import pickle

        with open(os.path.join(dataroot, "meta_info.pkl"), "rb") as f:
            meta = pickle.load(f)
        paths, sizes = meta["keys"], meta["resolution"]
        if len(sizes) == 1:
            sizes = sizes * len(paths)
        return paths, sizes
    raise NotImplementedError(f"data_type {data_type!r} not supported "
                              "(img or lmdb)")


def open_lmdb(dataroot: str):
    """lmdb.open(readonly) equivalent over the pure-Python reader
    (LQGT_dataset.py:58-74)."""
    from daclip_tpu.data.lmdb import LmdbReader

    return LmdbReader(dataroot)


def _read_img_lmdb(env, key: str, size) -> np.ndarray:
    """util.py:57-65: raw uint8 bytes keyed by name, (C, H, W) shape tuple."""
    buf = env.get(key)
    if buf is None:
        raise KeyError(f"key {key!r} not found in lmdb")
    C, H, W = size
    return np.frombuffer(buf, dtype=np.uint8).reshape(H, W, C)


def _native_io():
    import os

    if os.environ.get("DACLIP_TPU_NATIVE_IO", "1") == "0":
        return None
    from daclip_tpu.data import native_io

    return native_io if native_io.available() else None


def read_img(env, path: str, size=None) -> np.ndarray:
    """cv2 (or lmdb when env is given) read → float32 HWC BGR in [0,1];
    grayscale gets a channel axis (util.py:68-85).  JPEG/PNG folder reads go
    through the native C++ decoder (data/native_io.py — bit-identical to cv2,
    GIL-free) when it is available."""
    if env is None:
        img = None
        nio = _native_io()
        if nio is not None and path.lower().endswith(
                (".jpg", ".jpeg", ".png")):
            try:
                img = nio.decode_file(path)
            except (ValueError, OSError):
                img = None
        if img is None:
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
    else:
        img = _read_img_lmdb(env, path, size)
    img = img.astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.expand_dims(img, axis=2)
    if img.shape[2] > 3:
        img = img[:, :, :3]
    return img


def read_imgs_cropped(paths, size: int, rng) -> list:
    """Read same-sized images and crop ALL to one random (size, size) window
    (the MD/LQGT training pattern: decode → shared random crop).  With the
    native decoder the JPEG IDCT runs only over the cropped window's rows and
    iMCU columns (~4× less decode work for 512²→256² crops); output is
    bit-identical to full-decode-then-crop.  Returns (imgs, (rnd_h, rnd_w))."""
    nio = _native_io()
    datas = None
    if nio is not None and all(p.lower().endswith((".jpg", ".jpeg", ".png"))
                               for p in paths):
        try:
            datas = []
            for p in paths:
                with open(p, "rb") as f:
                    datas.append(f.read())
            W, H, _ = nio.probe(datas[0])
        except (ValueError, OSError):
            datas = None
    if datas is None:
        imgs = [read_img(None, p) for p in paths]
        H, W = imgs[0].shape[:2]
    # exactly ONE randint pair per call, drawn from the same (H, W), on every
    # path — the RNG stream and crop windows are identical whether the native
    # decoder is present, absent, or fails mid-decode
    rnd_h = rng.randint(0, max(0, H - size))
    rnd_w = rng.randint(0, max(0, W - size))
    if datas is not None:
        crop = (rnd_w, rnd_h, min(size, W - rnd_w), min(size, H - rnd_h))
        try:
            imgs = [nio.decode(d, crop=crop).astype(np.float32) / 255.0
                    for d in datas]
            return imgs, (rnd_h, rnd_w)
        except (ValueError, OSError):
            # cv2 fallback on ANY native failure (undecodable variant,
            # 16-bit/alpha/palette-tRNS PNG, truncated file) — REUSES the
            # already-drawn crop
            imgs = [read_img(None, p) for p in paths]
    return ([im[rnd_h:rnd_h + size, rnd_w:rnd_w + size, :] for im in imgs],
            (rnd_h, rnd_w))


def save_img(img: np.ndarray, img_path: str):
    cv2.imwrite(img_path, img)


def augment(img_list: Sequence[np.ndarray], hflip: bool = True, rot: bool = True,
            mode=None, rng: Optional[random.Random] = None):
    """Random horizontal flip / vertical flip / transpose (util.py:98-116)."""
    rng = rng or random
    hflip = hflip and rng.random() < 0.5
    vflip = rot and rng.random() < 0.5
    rot90 = rot and rng.random() < 0.5

    def _aug(img):
        if hflip:
            img = img[:, ::-1, :]
        if vflip:
            img = img[::-1, :, :]
        if rot90:
            img = img.transpose(1, 0, 2)
        return np.ascontiguousarray(img)

    return [_aug(img) for img in img_list]


def channel_convert(in_c: int, tar_type: str, img_list):
    if in_c == 3 and tar_type == "gray":
        return [np.expand_dims(cv2.cvtColor(img, cv2.COLOR_BGR2GRAY), 2)
                for img in img_list]
    if in_c == 3 and tar_type == "y":
        return [np.expand_dims(bgr2ycbcr(img, only_y=True), 2) for img in img_list]
    if in_c == 1 and tar_type == "RGB":
        return [cv2.cvtColor(img, cv2.COLOR_GRAY2BGR) for img in img_list]
    return img_list


def rgb2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """ITU-R BT.601 full-swing, MATLAB-compatible (util.py:160-187 analogue)."""
    in_type = img.dtype
    x = img.astype(np.float64)
    if in_type != np.uint8:
        x = x * 255.0
    if only_y:
        out = x @ np.asarray([65.481, 128.553, 24.966]) / 255.0 + 16.0
    else:
        out = x @ np.asarray([[65.481, -37.797, 112.0],
                              [128.553, -74.203, -93.786],
                              [24.966, 112.0, -18.214]]) / 255.0 + [16, 128, 128]
    if in_type == np.uint8:
        out = out.round()
    else:
        out = out / 255.0
    return out.astype(in_type)


def bgr2ycbcr(img: np.ndarray, only_y: bool = True) -> np.ndarray:
    """BGR variant (util.py:189-211) — needed for PSNR_Y parity on cv2 images."""
    in_type = img.dtype
    x = img.astype(np.float64)
    if in_type != np.uint8:
        x = x * 255.0
    if only_y:
        out = x @ np.asarray([24.966, 128.553, 65.481]) / 255.0 + 16.0
    else:
        out = x @ np.asarray([[24.966, 112.0, -18.214],
                              [128.553, -74.203, -93.786],
                              [65.481, -37.797, 112.0]]) / 255.0 + [16, 128, 128]
    if in_type == np.uint8:
        out = out.round()
    else:
        out = out / 255.0
    return out.astype(in_type)


def modcrop(img_in: np.ndarray, scale: int) -> np.ndarray:
    img = np.copy(img_in)
    if img.ndim == 2:
        h, w = img.shape
        img = img[: h - h % scale, : w - w % scale]
    elif img.ndim == 3:
        h, w, _ = img.shape
        img = img[: h - h % scale, : w - w % scale, :]
    else:
        raise ValueError(f"wrong img ndim: {img.ndim}")
    return img


# ---------------------------------------------------------------------------------
# MATLAB imresize (bicubic, antialiased) — numpy
# ---------------------------------------------------------------------------------

def _cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    ax2, ax3 = ax ** 2, ax ** 3
    return ((1.5 * ax3 - 2.5 * ax2 + 1) * (ax <= 1)
            + (-0.5 * ax3 + 2.5 * ax2 - 4 * ax + 2) * ((ax > 1) & (ax <= 2)))


def _resize_weights(in_len: int, out_len: int, scale: float, antialias=True):
    kernel_width = 4.0
    if scale < 1 and antialias:
        kernel_width = kernel_width / scale
    x = np.arange(1, out_len + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(np.ceil(kernel_width)) + 2
    idx = left[:, None] + np.arange(p)[None, :] - 1          # 0-based candidate idx
    dist = u[:, None] - (idx + 1)
    if scale < 1 and antialias:
        w = scale * _cubic(dist * scale)
    else:
        w = _cubic(dist)
    w = w / np.sum(w, axis=1, keepdims=True)
    # MATLAB symmetric boundary fold (reference util.py:314-340 pads with
    # flipped copies): 0-based index -1 → 0, -2 → 1, in_len → in_len-1, …
    aux = np.concatenate([np.arange(in_len), np.arange(in_len - 1, -1, -1)])
    idx = aux[np.mod(idx.astype(np.int64), 2 * in_len)]
    # drop all-zero weight columns
    keep = ~np.all(w == 0, axis=0)
    return w[:, keep], idx[:, keep]


def imresize_np(img: np.ndarray, scale: float, antialiasing: bool = True) -> np.ndarray:
    """MATLAB-style bicubic resize of HWC float imagery (reference
    util.py:344-399 parity incl. symmetric border folding)."""
    squeeze = False
    if img.ndim == 2:
        img = img[:, :, None]
        squeeze = True
    in_h, in_w, c = img.shape
    out_h = int(np.ceil(in_h * scale))
    out_w = int(np.ceil(in_w * scale))
    x = img.astype(np.float64)

    w_h, idx_h = _resize_weights(in_h, out_h, scale, antialiasing)
    x = np.einsum("ok,okwc->owc", w_h, x[idx_h], optimize=True)
    w_w, idx_w = _resize_weights(in_w, out_w, scale, antialiasing)
    x = np.einsum("ok,hokc->hoc", w_w, x[:, idx_w], optimize=True)

    out = x.astype(img.dtype if img.dtype != np.uint8 else np.float64)
    if squeeze:
        out = out[:, :, 0]
    return out
