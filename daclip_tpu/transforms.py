"""Host-side image preprocessing for the CLIP towers — numpy/PIL, never jitted.

Reference parity (bit-close: uses the same PIL bicubic resize that torchvision's
PIL backend uses):
  val transform   — open_clip/transform.py:124-133 (Resize shorter-side bicubic +
                    CenterCrop + normalize)
  train transform — open_clip/transform.py:105-114 (RandomResizedCrop scale
                    (0.9, 1.0))
  clip_transform  — predict.py:94-106 / data/util.py:87-96 ([0,1] float RGB numpy →
                    uint8 → PIL → 224 view)
  OpenAI mean/std — open_clip/constants.py:1-2

Output layout is NHWC float32 (TPU-native) — the reference's CHW tensors are a
torch convention our models don't use.
"""
from __future__ import annotations

import math
import random
from typing import Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image

OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)


def _to_pil(img) -> Image.Image:
    if isinstance(img, Image.Image):
        return img
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 1:
        # grayscale from channel_convert (H,W,1): the reference's
        # Image.fromarray would crash here (latent upstream bug — its training
        # configs never hit gray+clip together); broadcast to RGB instead
        arr = np.repeat(arr, 3, axis=2)
    return Image.fromarray(arr)


def _resize_shorter(im: Image.Image, size: int) -> Image.Image:
    w, h = im.size
    if w <= h:
        nw, nh = size, max(1, int(round(size * h / w)))
    else:
        nw, nh = max(1, int(round(size * w / h))), size
    return im.resize((nw, nh), Image.BICUBIC)


def _center_crop(im: Image.Image, size: int) -> Image.Image:
    w, h = im.size
    # torchvision pads when the image is smaller than the crop
    if w < size or h < size:
        canvas = Image.new(im.mode, (max(w, size), max(h, size)))
        canvas.paste(im, ((canvas.width - w) // 2, (canvas.height - h) // 2))
        im = canvas
        w, h = im.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return im.crop((left, top, left + size, top + size))


def _normalize(arr: np.ndarray, mean, std) -> np.ndarray:
    arr = arr.astype(np.float32) / 255.0
    return (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def clip_transform(np_image: np.ndarray, resolution: int = 224,
                   mean=OPENAI_DATASET_MEAN, std=OPENAI_DATASET_STD) -> np.ndarray:
    """[0,1] float RGB HWC → normalized (resolution, resolution, 3) f32."""
    im = _to_pil(np_image)
    im = _resize_shorter(im, resolution)
    im = _center_crop(im, resolution)
    return _normalize(np.asarray(im.convert("RGB")), mean, std)


def _random_resized_crop(im: Image.Image, size: int, scale=(0.9, 1.0),
                         ratio=(3 / 4, 4 / 3),
                         rng: Optional[random.Random] = None) -> Image.Image:
    """torchvision RandomResizedCrop algorithm (10 tries then center fallback)."""
    rng = rng or random
    w, h = im.size
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(scale[0], scale[1])
        aspect = math.exp(rng.uniform(log_ratio[0], log_ratio[1]))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = rng.randint(0, w - cw)
            top = rng.randint(0, h - ch)
            return im.resize((size, size), Image.BICUBIC,
                             box=(left, top, left + cw, top + ch))
    # fallback: center crop to in-range aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    left, top = (w - cw) // 2, (h - ch) // 2
    return im.resize((size, size), Image.BICUBIC,
                     box=(left, top, left + cw, top + ch))


def resize_max_size(img, max_size: int = 224, fill_color=0,
                    fn=min) -> np.ndarray:
    """ResizeMaxSize (open_clip/transform.py:26-49): scale so the LONGEST side is
    max_size, pad the rest with fill_color; returns uint8 HWC RGB."""
    im = _to_pil(img).convert("RGB")
    w, h = im.size
    scale = max_size / float(max(h, w))
    if scale != 1.0:
        im = im.resize((max(1, int(round(w * scale))),
                        max(1, int(round(h * scale)))), Image.BICUBIC)
    w, h = im.size
    canvas = Image.new("RGB", (max_size, max_size),
                       tuple([fill_color] * 3) if np.isscalar(fill_color)
                       else tuple(fill_color))
    canvas.paste(im, ((max_size - w) // 2, (max_size - h) // 2))
    return np.asarray(canvas)


def image_transform(image_size: Union[int, Tuple[int, int]] = 224,
                    is_train: bool = False,
                    mean: Optional[Sequence[float]] = None,
                    std: Optional[Sequence[float]] = None,
                    scale: Tuple[float, float] = (0.9, 1.0),
                    seed: Optional[int] = None,
                    backend: str = "pil"):
    """Returns fn(image) -> (H, W, 3) normalized f32, HWC.

    image: PIL image, uint8 HWC, or [0,1] float HWC numpy array.

    backend: "pil" (default — bit-close to the reference's torchvision/PIL
    path, required for eval/PSNR parity) or "cv2" — an opt-in fast path for
    training-throughput-bound hosts: cv2/numpy end to end, INTER_AREA
    downscale (box antialiasing, the standard cv2 stand-in for PIL's
    antialiased bicubic) / INTER_CUBIC upscale.  Same geometry (shorter-side
    resize + center crop; RandomResizedCrop with the same rng draws), NOT the
    same resample kernel — do not use it for parity evals.
    """
    mean = tuple(mean or OPENAI_DATASET_MEAN)
    std = tuple(std or OPENAI_DATASET_STD)
    if isinstance(image_size, (tuple, list)):
        image_size = image_size[0]
    rng = random.Random(seed) if seed is not None else None
    if backend == "cv2":
        return _cv2_transform(image_size, is_train, mean, std, scale, rng)
    assert backend == "pil", backend

    def val_fn(img):
        return clip_transform(img, image_size, mean, std)

    def train_fn(img):
        im = _to_pil(img).convert("RGB")
        im = _random_resized_crop(im, image_size, scale=scale, rng=rng)
        return _normalize(np.asarray(im), mean, std)

    return train_fn if is_train else val_fn


def _to_u8rgb(img) -> np.ndarray:
    """Any accepted input → uint8 HWC RGB ndarray without a PIL round-trip."""
    if isinstance(img, Image.Image):
        return np.asarray(img.convert("RGB"))
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


def _cv2_resize(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    import cv2

    shrinking = w * h < arr.shape[0] * arr.shape[1]
    return cv2.resize(arr, (w, h), interpolation=cv2.INTER_AREA if shrinking
                      else cv2.INTER_CUBIC)


def _cv2_transform(size: int, is_train: bool, mean, std, scale,
                   rng: Optional[random.Random]):
    def val_fn(img):
        arr = _to_u8rgb(img)
        h, w = arr.shape[:2]
        if w <= h:
            nw, nh = size, max(1, int(round(size * h / w)))
        else:
            nw, nh = max(1, int(round(size * w / h))), size
        arr = _cv2_resize(arr, nw, nh)
        h, w = arr.shape[:2]
        top = int(round((h - size) / 2.0))
        left = int(round((w - size) / 2.0))
        return _normalize(arr[top:top + size, left:left + size], mean, std)

    def train_fn(img):
        arr = _to_u8rgb(img)
        h, w = arr.shape[:2]
        r = rng or random
        area = w * h
        log_ratio = (math.log(3 / 4), math.log(4 / 3))
        for _ in range(10):
            target_area = area * r.uniform(scale[0], scale[1])
            aspect = math.exp(r.uniform(log_ratio[0], log_ratio[1]))
            cw = int(round(math.sqrt(target_area * aspect)))
            ch = int(round(math.sqrt(target_area / aspect)))
            if 0 < cw <= w and 0 < ch <= h:
                left = r.randint(0, w - cw)
                top = r.randint(0, h - ch)
                crop = arr[top:top + ch, left:left + cw]
                return _normalize(_cv2_resize(crop, size, size), mean, std)
        return val_fn(arr)

    return train_fn if is_train else val_fn
