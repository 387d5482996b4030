"""Minimal webdataset-style tar-shard reader — the TPU-host replacement for the
reference's webdataset pipeline (da-clip/src/training/data.py:273-551:
ResampledShards2 / detshuffle2 / tarfile_to_samples / node+worker splitting).

Pure-stdlib (tarfile + braces expansion); supports:
  * brace-expanded shard lists ("shards-{000..009}.tar"),
  * deterministic epoch-seeded shard shuffling (detshuffle2 parity: seed =
    base_seed + epoch),
  * per-host shard striding (node splitting), resampled (with-replacement)
    shard sampling for iteration-based training,
  * grouping of same-stem files into samples ({jpg/png, txt/caption, json}).
"""
from __future__ import annotations

import io
import json
import os
import random
import re
import tarfile
from typing import Dict, Iterator, List, Optional

import numpy as np


def brace_expand(pattern: str) -> List[str]:
    """Expand one {000..123} or {a,b,c} group (webdataset shard syntax)."""
    m = re.search(r"\{(\d+)\.\.(\d+)\}", pattern)
    if m:
        lo, hi = m.group(1), m.group(2)
        width = len(lo)
        return [pattern[:m.start()] + str(i).zfill(width) + pattern[m.end():]
                for i in range(int(lo), int(hi) + 1)]
    m = re.search(r"\{([^{}]*,[^{}]*)\}", pattern)
    if m:
        return [pattern[:m.start()] + part + pattern[m.end():]
                for part in m.group(1).split(",")]
    return [pattern]


def expand_urls(urls) -> List[str]:
    if isinstance(urls, str):
        urls = urls.split("::")
    out: List[str] = []
    for u in urls:
        out.extend(brace_expand(u))
    return out


def _decode(name: str, data: bytes):
    ext = name.split(".")[-1].lower()
    if ext in ("jpg", "jpeg", "png", "webp", "bmp"):
        from PIL import Image
        return Image.open(io.BytesIO(data)).convert("RGB")
    if ext in ("txt", "caption", "text"):
        return data.decode("utf-8")
    if ext == "json":
        return json.loads(data)
    if ext in ("npy",):
        return np.load(io.BytesIO(data))
    return data


class WebDataset:
    """Iterable over dict samples from tar shards.

    keys of each sample: file extensions (e.g. sample['jpg'], sample['txt'])
    plus '__key__'.  Iteration order is deterministic given (seed, epoch).
    """

    def __init__(self, urls, shuffle_buffer: int = 0, seed: int = 0,
                 host_id: int = 0, num_hosts: int = 1, resampled: bool = False,
                 samples_per_epoch: Optional[int] = None, weights=None):
        """`weights`: per-source upsampling factors aligned with the '::'-
        separated sources of `urls` (--train-data-upsampling-factors,
        training/data.py); only meaningful with resampled=True, where shard
        draws are weighted by the owning source's factor."""
        if isinstance(urls, str) and "::" in urls:
            sources = urls.split("::")
        else:
            sources = [urls] if isinstance(urls, str) else list(urls)
        self.shards = []
        self.shard_weights = []
        if weights is not None and len(weights) != len(sources):
            raise ValueError(
                f"{len(weights)} upsampling factors for {len(sources)} sources")
        for si, src in enumerate(sources):
            expanded = expand_urls(src)
            self.shards.extend(expanded)
            w = 1.0 if weights is None else float(weights[si])
            self.shard_weights.extend([w] * len(expanded))
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        self.epoch = 0
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.resampled = resampled
        self.samples_per_epoch = samples_per_epoch

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _shard_list(self) -> List[str]:
        rng = random.Random(self.seed + self.epoch)  # detshuffle2 parity
        shards = list(self.shards)
        if self.resampled:
            if any(w != 1.0 for w in self.shard_weights):
                shards = rng.choices(shards, weights=self.shard_weights,
                                     k=len(shards))
            else:
                shards = [rng.choice(shards) for _ in range(len(shards))]
        else:
            rng.shuffle(shards)
        return shards[self.host_id::self.num_hosts]

    def _iter_shard(self, path: str) -> Iterator[Dict]:
        current_key, sample = None, {}
        with tarfile.open(path) as tf:
            for member in tf:
                if not member.isfile():
                    continue
                base = os.path.basename(member.name)
                if "." not in base:
                    continue
                key, ext = base.split(".", 1)
                if key != current_key:
                    if sample:
                        yield sample
                    current_key, sample = key, {"__key__": key}
                data = tf.extractfile(member).read()
                sample[ext] = _decode(base, data)
        if sample:
            yield sample

    def __iter__(self) -> Iterator[Dict]:
        rng = random.Random(self.seed * 1000003 + self.epoch)
        buf: List[Dict] = []
        count = 0
        limit = self.samples_per_epoch or float("inf")
        for shard in self._shard_list():
            for sample in self._iter_shard(shard):
                if count >= limit:
                    break
                if self.shuffle_buffer > 1:
                    buf.append(sample)
                    if len(buf) >= self.shuffle_buffer:
                        idx = rng.randrange(len(buf))
                        buf[idx], buf[-1] = buf[-1], buf[idx]
                        yield buf.pop()
                        count += 1
                else:
                    yield sample
                    count += 1
            if count >= limit:
                break
        rng.shuffle(buf)
        for s in buf:
            if count >= limit:
                break
            yield s
            count += 1


_IMAGE_EXTS = ("jpg", "jpeg", "png", "webp", "bmp")
_TEXT_EXTS = ("txt", "caption", "text")


class ClipWebLoader:
    """Batched CLIP-training view over `WebDataset` (reference
    get_wds_dataset, da-clip/src/training/data.py:331-426): picks the image /
    caption fields off each decoded sample, applies the train transform +
    tokenizer, and collates fixed-size {'images','texts'} numpy batches
    (partial trailing batches dropped, wds batched(..., partial=not is_train)
    parity).

    `__len__` is `num_samples // batch_size` — the reference's num_batches
    maths, which is why --train-num-samples is mandatory for webdataset
    sources there too (data.py:344-352)."""

    def __init__(self, wds: WebDataset, transform, tokenizer, batch_size: int,
                 num_samples: int):
        if num_samples <= 0:
            raise ValueError(
                "webdataset sources need --train-num-samples (the shard list "
                "carries no size metadata; training/data.py:344-352)")
        self.wds = wds
        self.transform = transform
        self.tokenize = tokenizer
        self.batch_size = batch_size
        self.num_batches = num_samples // batch_size

    def set_epoch(self, epoch: int):
        self.wds.set_epoch(epoch)

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        imgs, caps, emitted = [], [], 0
        while emitted < self.num_batches:          # resample epochs as needed
            usable_any = False
            for sample in self.wds:
                img = next((v for k, v in sample.items()
                            if k.split(".")[-1].lower() in _IMAGE_EXTS), None)
                cap = next((v for k, v in sample.items()
                            if k.split(".")[-1].lower() in _TEXT_EXTS), None)
                if img is None or cap is None:
                    continue
                usable_any = True
                imgs.append(self.transform(img))
                caps.append(cap)
                if len(imgs) == self.batch_size:
                    texts = np.asarray(self.tokenize(caps), np.int32)
                    yield {"images": np.stack(imgs).astype(np.float32),
                           "texts": texts}
                    imgs, caps = [], []
                    emitted += 1
                    if emitted >= self.num_batches:
                        return
            # a pass can decode samples yet contain no usable (image, text)
            # pairs — gating on "usable", not "decoded", keeps that from
            # spinning forever; and each fill-up pass advances the shuffle
            # epoch so refills are reshuffled, not byte-identical repeats
            if not usable_any:
                raise RuntimeError(
                    "webdataset produced no usable image+text samples from "
                    f"shards {self.wds.shards[:3]}… (check extensions: "
                    f"images {sorted(_IMAGE_EXTS)}, text {sorted(_TEXT_EXTS)})")
            self.wds.set_epoch(self.wds.epoch + 1)
