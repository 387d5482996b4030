"""CSV/TSV dataset for DA-CLIP training, with degradation parsing and the
bin-center / level-prompt banks.

Reference: da-clip/src/training/data.py:29-156.  Faithful quirks preserved:
  * bin centers are stored as INTEGERS — the reference builds the bank with
    torch.long, truncating blur/resize centers like 0.75→0 (data.py:88);
    set `exact_bins=True` for the float centers (documented extension).
  * caption format "<caption>| <degradation>", degradations parsed with
    r'(\\w+)\\s+with parameter\\s+([\\d.]+)' (data.py:55).
  * level grids: blur/resize 0.5..4.0 step .5, noisy 5..40 step 5,
    jpeg 10..80 step 10 (data.py:71-78; same grids as generate_LQ.py:19-112).

TPU-native change: the 28 level prompts and bin banks are CONSTANTS returned once
via `.banks()` instead of being copied into every sample (the reference returns
them per item, data.py:156 — pure waste)."""
from __future__ import annotations

import csv
import random
import re
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from daclip_tpu.tokenizer import tokenize as default_tokenize

DEGRADATION_TYPES = ["blur", "noisy", "resize", "jpeg"]
DEG_TYPE_TO_ID = {"blur": 0, "noisy": 1, "resize": 2, "jpeg": 3}

LEVEL_DESCRIPTIONS = {
    "blur": ["almost sharp", "slightly blurry", "mildly blurry",
             "moderately blurry", "noticeably blurry", "heavily blurred",
             "extremely blurry"],
    "resize": ["nearly original size", "slightly downscaled", "noticeably resized",
               "significantly downscaled", "severely downscaled", "extremely small",
               "barely visible size"],
    "noisy": ["almost noise-free", "slightly noisy", "mildly noisy",
              "moderately noisy", "noticeably noisy", "heavily noisy",
              "extremely noisy"],
    "jpeg": ["high quality jpeg", "slightly compressed jpeg",
             "noticeably compressed jpeg", "moderately compressed jpeg",
             "heavily compressed jpeg", "very low quality jpeg",
             "extremely compressed jpeg"],
}


def level_grid(d_type: str) -> np.ndarray:
    if d_type in ("blur", "resize"):
        return np.arange(0.5, 4.1, 0.5)
    if d_type == "noisy":
        return np.arange(5, 41, 5)
    if d_type == "jpeg":
        return np.arange(10, 81, 10)
    raise ValueError(d_type)


def build_banks(tokenizer: Callable = default_tokenize, exact_bins: bool = False
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (bin_center_bank (4,7), all_d_type_tokens (28, 77))."""
    centers_all, tokens_all = [], []
    for d_type in DEGRADATION_TYPES:
        levels = level_grid(d_type)
        centers = [(s + e) / 2 for s, e in zip(levels[:-1], levels[1:])]
        if not exact_bins:
            centers = [int(c) for c in centers]  # torch.long truncation parity
        centers_all.append(np.asarray(centers, np.float32))
        for p in LEVEL_DESCRIPTIONS[d_type][: len(centers)]:
            tokens_all.append(tokenizer([p])[0])
    return np.stack(centers_all), np.stack(tokens_all).astype(np.int32)


def parse_degradations(degradation: str) -> Dict[str, float]:
    matches = re.findall(r"(\w+)\s+with parameter\s+([\d.]+)", degradation)
    return {d_type: float(val) for d_type, val in matches}


def _random_crop_pil(im, low_size=64, rng=None):
    """data.py:29-34 (note the reference swaps h/w from PIL .size — kept).
    Accepts a PIL image or an HWC ndarray (cv2 decode path) — identical box
    geometry and rng draws either way."""
    rng = rng or random
    is_arr = not hasattr(im, "crop")
    # PIL .size is (width, height); the reference names them (h, w) — kept
    h, w = (im.shape[1], im.shape[0]) if is_arr else im.size
    size = rng.randint(low_size, min(h, w))
    rnd_h = rng.randint(0, max(0, h - size))
    rnd_w = rng.randint(0, max(0, w - size))
    if is_arr:
        # PIL crop box is (left, upper, right, lower) = (x0, y0, x1, y1)
        return im[rnd_w:rnd_w + size, rnd_h:rnd_h + size]
    return im.crop((rnd_h, rnd_w, rnd_h + size, rnd_w + size))


class CsvDataset:
    """__getitem__ → dict with images/texts/gt_images/deg_type/gt_val (numpy).

    images/gt_images: (H, W, 3) normalized f32 (transform output, NHWC);
    texts: (154,) int32 for --da (caption‖degradation, 77+77) else (77,).
    """

    def __init__(self, input_filename: str, transforms: Callable,
                 img_key: str = "filepath", caption_key: str = "title",
                 sep: str = "\t", tokenizer: Callable = default_tokenize,
                 da: bool = False, crop: bool = False, exact_bins: bool = False,
                 seed: Optional[int] = None, decode: str = "pil"):
        # decode="cv2" is the opt-in fast path (pairs with
        # transforms.image_transform(backend="cv2")): cv2.imread instead of a
        # PIL decode + convert round-trip per image. Same pixels for 8-bit
        # sources; keep "pil" (default) for parity evals.
        assert decode in ("pil", "cv2"), decode
        self.transforms = transforms
        self.tokenize = tokenizer
        self.da = da
        self.crop = crop
        self.decode = decode
        self.rng = random.Random(seed)

        self.images: List[str] = []
        self.captions: List[str] = []
        with open(input_filename, newline="") as f:
            reader = csv.DictReader(f, delimiter=sep)
            for row in reader:
                self.images.append(row[img_key])
                self.captions.append(row[caption_key])

        self.samples = []
        for path, caption in zip(self.images, self.captions):
            _, degradation = caption.split("| ")
            self.samples.append({
                "img": path,
                "degra_dict": parse_degradations(degradation),
                "degradation": degradation,
            })

        self.bin_center_bank, self.all_d_type_tokens = build_banks(
            tokenizer, exact_bins)

    def banks(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.bin_center_bank, self.all_d_type_tokens

    def __len__(self):
        return len(self.captions)

    def _open(self, path: str):
        if self.decode == "cv2":
            import cv2
            import numpy as np

            arr = cv2.imread(path, cv2.IMREAD_COLOR)
            if arr is None:
                raise FileNotFoundError(path)
            return np.ascontiguousarray(arr[:, :, ::-1])  # BGR -> RGB uint8
        from PIL import Image

        return Image.open(path)

    def __getitem__(self, idx: int) -> Dict:
        image = self._open(str(self.images[idx]))
        gt_image = self._open(str(self.images[idx]).replace("LQ", "GT"))
        texts = str(self.captions[idx])
        sample = self.samples[idx]

        deg_type = np.zeros(4, np.float32)
        gt_val = np.zeros(4, np.float32)
        for k, v in sample["degra_dict"].items():
            deg_type[DEG_TYPE_TO_ID[k]] = 1
            gt_val[DEG_TYPE_TO_ID[k]] = v

        if self.da:
            caption, degradation = texts.split("| ")
            tok = np.concatenate([self.tokenize([caption])[0],
                                  self.tokenize([degradation])[0]]).astype(np.int32)
            if self.crop and self.rng.random() > 0.2:
                image = _random_crop_pil(image, rng=self.rng)
        else:
            tok = self.tokenize([texts])[0].astype(np.int32)

        return {
            "images": self.transforms(image).astype(np.float32),
            "texts": tok,
            "gt_images": self.transforms(gt_image).astype(np.float32),
            "deg_type": deg_type,
            "gt_val": gt_val,
        }


class SyntheticDataset:
    """Constant-image/caption smoke dataset (training/data.py:588-635) — the hook
    for pipeline tests without real data."""

    def __init__(self, transforms: Callable = None, image_size=(224, 224),
                 caption: str = "Dummy caption", dataset_size: int = 100,
                 tokenizer: Callable = default_tokenize, da: bool = False):
        from PIL import Image

        self.image = Image.new("RGB", image_size)
        self.transforms = transforms
        self.caption = caption
        self.dataset_size = dataset_size
        self.tokenize = tokenizer
        self.da = da
        self.bin_center_bank, self.all_d_type_tokens = build_banks(tokenizer)

    def banks(self):
        return self.bin_center_bank, self.all_d_type_tokens

    def __len__(self):
        return self.dataset_size

    def __getitem__(self, idx: int) -> Dict:
        img = (self.transforms(self.image) if self.transforms
               else np.zeros((224, 224, 3), np.float32))
        if self.da:
            tok = np.concatenate([self.tokenize([self.caption])[0],
                                  self.tokenize(["noisy with parameter 25"])[0]]
                                 ).astype(np.int32)
        else:
            tok = self.tokenize([self.caption])[0].astype(np.int32)
        return {"images": img.astype(np.float32), "texts": tok,
                "gt_images": img.astype(np.float32),
                "deg_type": np.array([0, 1, 0, 0], np.float32),
                "gt_val": np.array([0, 25, 0, 0], np.float32)}
