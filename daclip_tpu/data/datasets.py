"""Dataset classes (host-side numpy), mirroring universal-image-restoration/data/:

  MDDataset   — MD_dataset.py:27-120 (train: round-robin type by index + random
                item; random crop, flip/rot, BGR→RGB, per-sample CLIP view)
  MDGTDataset — MDGT_dataset.py:15-81 (GT-only + on-the-fly random_degrade,
                10% grayscale at train)
  LQGTDataset — LQGT_dataset.py:14-151 (paired folders, 20% grayscale at train)
  LQDataset / GTDataset — unpaired single-folder variants

Samples are dicts of numpy arrays in OUR conventions: HWC RGB float32 [0,1] for
'GT'/'LQ', normalized (224,224,3) f32 for 'LQ_clip' (HWC, not CHW — TPU NHWC).
"""
from __future__ import annotations

import os
import random
from typing import Dict, List, Optional

import numpy as np

from daclip_tpu.data import util
from daclip_tpu.transforms import clip_transform


def _finalize(img_GT, img_LQ, rng=None, clip_res: int = 224) -> Dict:
    """BGR→RGB + CLIP view, shared tail of every dataset __getitem__."""
    if img_GT is not None and img_GT.shape[2] == 3:
        img_GT = img_GT[:, :, ::-1].copy()
    if img_LQ is not None and img_LQ.shape[2] == 3:
        img_LQ = img_LQ[:, :, ::-1].copy()
    out = {}
    if img_GT is not None:
        out["GT"] = img_GT.astype(np.float32)
    if img_LQ is not None:
        out["LQ"] = img_LQ.astype(np.float32)
        out["LQ_clip"] = clip_transform(img_LQ, clip_res)
    return out


class MDDataset:
    """Multi-degradation paired folders `<dataroot>/<deg_type>/{GT,LQ}`."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.size = opt.get("patch_size")
        self.deg_types = list(opt["distortion"])
        self.phase = opt.get("phase", "train")
        self.distortion = {}
        for deg_type in self.deg_types:
            gt = util.get_image_paths(opt.get("data_type"),
                                      os.path.join(opt["dataroot"], deg_type, "GT"))
            lq = util.get_image_paths(opt.get("data_type"),
                                      os.path.join(opt["dataroot"], deg_type, "LQ"))
            assert len(gt) == len(lq), (deg_type, len(gt), len(lq))
            self.distortion[deg_type] = (gt, lq)
        self.data_lens = [len(self.distortion[t][0]) for t in self.deg_types]
        self.rng = random.Random(opt.get("seed"))

    def __len__(self):
        return int(np.sum(self.data_lens))

    def __getitem__(self, index: int) -> Dict:
        type_id = int(index % len(self.deg_types))
        if self.phase == "train":
            deg_type = self.deg_types[type_id]
            index = self.rng.randrange(self.data_lens[type_id])
        else:
            while index // len(self.deg_types) >= self.data_lens[type_id]:
                index += 1
                type_id = int(index % len(self.deg_types))
            deg_type = self.deg_types[type_id]
            index = index // len(self.deg_types)

        GT_path = self.distortion[deg_type][0][index]
        LQ_path = self.distortion[deg_type][1][index]
        if self.phase == "train":
            # shared random crop at decode time (native IO decodes only the
            # cropped window's JPEG rows/columns; util.read_imgs_cropped)
            (img_GT, img_LQ), _ = util.read_imgs_cropped(
                [GT_path, LQ_path], self.size, self.rng)
            img_LQ, img_GT = util.augment([img_LQ, img_GT],
                                          self.opt.get("use_flip", True),
                                          self.opt.get("use_rot", True),
                                          rng=self.rng)
        else:
            img_GT = util.read_img(None, GT_path)
            img_LQ = util.read_img(None, LQ_path)
        if self.opt.get("color"):
            img_GT = util.channel_convert(img_GT.shape[2], self.opt["color"], [img_GT])[0]
            img_LQ = util.channel_convert(img_LQ.shape[2], self.opt["color"], [img_LQ])[0]

        out = _finalize(img_GT, img_LQ, self.rng,
                        self.opt.get("clip_size", 224))
        out.update({"type": deg_type, "GT_path": GT_path, "LQ_path": LQ_path})
        return out


class MDGTDataset:
    """GT-only folders + on-the-fly degradation synthesis (wild-ir training).

    Synthesis cache (opt-in, NOT in the reference): `random_degrade` is a
    serial numpy/cv2 pipeline — on synthesis-bound hosts it caps the loader
    far below device-step speed (BASELINE.md input-pipeline table).  With
    `lq_cache: N` the dataset keeps a bounded global pool of N synthesized
    (GT, LQ) pairs: each fetch synthesizes fresh with probability
    `lq_cache_refresh` (default 1/4, continuously turning the pool over) and
    otherwise serves a random cached pair under a FRESH flip/rot draw (a
    dihedral re-augmentation of a valid pair is a valid pair, so diversity
    in orientation is preserved; crop/degradation diversity turns over at the
    refresh rate).  Memory bound = N·2·patch²·3·4B (~1.5 MB/pair at 256²)."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.GT_size = opt.get("patch_size")
        self.phase = opt.get("phase", "train")
        self.GT_paths = util.get_image_paths(opt.get("data_type"), opt["dataroot_GT"])
        self.rng = random.Random(opt.get("seed"))
        self.lq_cache_size = int(opt.get("lq_cache", 0) or 0)
        self.lq_cache_refresh = float(opt.get("lq_cache_refresh", 0.25))
        self._lq_cache: List = []

    def __len__(self):
        return len(self.GT_paths)

    def _synthesize(self, index: int):
        from daclip_tpu.data import degradations as deg_util

        GT_path = self.GT_paths[index]
        # random crop at decode time (util.read_imgs_cropped); the color
        # convert commutes with cropping so it moves after the read
        (img_GT,), _ = util.read_imgs_cropped([GT_path], self.GT_size,
                                              self.rng)
        if self.opt.get("color"):
            img_GT = util.channel_convert(img_GT.shape[2], self.opt["color"], [img_GT])[0]
        img_GT = util.augment([img_GT], self.opt.get("use_flip", True),
                              self.opt.get("use_rot", True), rng=self.rng)[0]
        if self.rng.random() < 0.1:  # MDGT_dataset.py:62-64
            img_GT = util.channel_convert(img_GT.shape[2], "gray", [img_GT])[0]
            img_GT = util.channel_convert(img_GT.shape[2],
                                          self.opt.get("color", "RGB"),
                                          [img_GT])[0]
        img_LQ = deg_util.random_degrade(img_GT, rng=self.rng)
        return img_GT, img_LQ, GT_path

    def __getitem__(self, index: int) -> Dict:
        if self.phase != "train":
            img_GT = util.read_img(None, self.GT_paths[index])
            if self.opt.get("color"):
                img_GT = util.channel_convert(img_GT.shape[2],
                                              self.opt["color"], [img_GT])[0]
            from daclip_tpu.data import degradations as deg_util
            img_LQ = deg_util.random_degrade(img_GT, rng=self.rng)
            out = _finalize(img_GT, img_LQ, self.rng,
                            self.opt.get("clip_size", 224))
            out["GT_path"] = self.GT_paths[index]
            return out

        cache = self._lq_cache
        if (self.lq_cache_size > 0 and len(cache) >= self.lq_cache_size
                and self.rng.random() >= self.lq_cache_refresh):
            # hit: fresh dihedral augmentation over a cached synthesized pair
            img_GT, img_LQ, GT_path = cache[self.rng.randrange(len(cache))]
            img_GT, img_LQ = util.augment(
                [img_GT, img_LQ], self.opt.get("use_flip", True),
                self.opt.get("use_rot", True), rng=self.rng)
        else:
            img_GT, img_LQ, GT_path = self._synthesize(index)
            if self.lq_cache_size > 0:
                entry = (img_GT, img_LQ, GT_path)
                if len(cache) >= self.lq_cache_size:  # random replacement
                    cache[self.rng.randrange(len(cache))] = entry
                else:
                    cache.append(entry)
        out = _finalize(img_GT, img_LQ, self.rng,
                        self.opt.get("clip_size", 224))
        out["GT_path"] = GT_path
        return out


class LQGTDataset:
    """Paired LQ/GT folders (test sets and paired training)."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.phase = opt.get("phase", "test")
        self.is_lmdb = opt.get("data_type") == "lmdb"
        self.GT_env = self.LR_env = None  # lazy (LQGT_dataset.py:58-74)
        if self.is_lmdb:
            self.GT_paths, self.GT_sizes = util.get_image_paths(
                "lmdb", opt["dataroot_GT"])
            self.LR_paths, self.LR_sizes = util.get_image_paths(
                "lmdb", opt["dataroot_LQ"])
        else:
            self.GT_paths = util.get_image_paths(opt.get("data_type"),
                                                 opt["dataroot_GT"])
            self.LR_paths = util.get_image_paths(opt.get("data_type"),
                                                 opt["dataroot_LQ"])
        self.rng = random.Random(opt.get("seed"))

    def __len__(self):
        return len(self.GT_paths)

    def _resolution(self, sizes, index):
        s = sizes[index]
        return [int(x) for x in s.split("_")] if isinstance(s, str) else s

    def __getitem__(self, index: int) -> Dict:
        if self.is_lmdb and self.GT_env is None:
            self.GT_env = util.open_lmdb(self.opt["dataroot_GT"])
            self.LR_env = util.open_lmdb(self.opt["dataroot_LQ"])
        scale = self.opt.get("scale") or 1
        GT_size = self.opt.get("patch_size")
        GT_path = self.GT_paths[index]
        LR_path = self.LR_paths[index]
        if self.is_lmdb:
            img_GT = util.read_img(self.GT_env, GT_path,
                                   self._resolution(self.GT_sizes, index))
            img_LR = util.read_img(self.LR_env, LR_path,
                                   self._resolution(self.LR_sizes, index))
        else:
            img_GT = util.read_img(None, GT_path)
            img_LR = util.read_img(None, LR_path)

        if self.phase == "train":
            H, W, _ = img_LR.shape
            LR_size = GT_size // scale
            rnd_h = self.rng.randint(0, max(0, H - LR_size))
            rnd_w = self.rng.randint(0, max(0, W - LR_size))
            img_LR = img_LR[rnd_h: rnd_h + LR_size, rnd_w: rnd_w + LR_size, :]
            gh, gw = int(rnd_h * scale), int(rnd_w * scale)
            img_GT = img_GT[gh: gh + GT_size, gw: gw + GT_size, :]
            img_LR, img_GT = util.augment([img_LR, img_GT],
                                          self.opt.get("use_flip", True),
                                          self.opt.get("use_rot", True),
                                          rng=self.rng)
            if self.rng.random() < 0.2:  # LQGT_dataset.py:129-131
                img_GT = util.channel_convert(img_GT.shape[2], "gray", [img_GT])[0]
                img_LR = util.channel_convert(img_LR.shape[2], "gray", [img_LR])[0]
                # keep 3 channels so batches collate and the 3-channel UNet
                # accepts them (the reference emits (1,H,W) here and would
                # crash both its collate and its model — untested upstream)
                img_GT = np.repeat(img_GT, 3, axis=2)
                img_LR = np.repeat(img_LR, 3, axis=2)
        if self.opt.get("color"):
            img_LR = util.channel_convert(img_LR.shape[2], self.opt["color"], [img_LR])[0]
            img_GT = util.channel_convert(img_GT.shape[2], self.opt["color"], [img_GT])[0]

        out = _finalize(img_GT, img_LR, self.rng,
                        self.opt.get("clip_size", 224))
        out.update({"LQ_path": LR_path, "GT_path": GT_path})
        return out

    def clip_view(self, index: int) -> np.ndarray:
        """Deterministic (224,224,3) CLIP view of the FULL LQ image — no crop,
        no augmentation.  Used by frozen-context caching (CachedContextDataset):
        with the DA-CLIP tower frozen, the context of sample `index` never
        changes across epochs, so it can be computed once.  Note the semantic
        difference from the reference (LQGT_dataset.py:143 derives lq4clip from
        the augmented random crop): the cached variant conditions on the whole
        image — opt-in via `cache_clip_contexts`."""
        if self.is_lmdb and self.LR_env is None:
            self.LR_env = util.open_lmdb(self.opt["dataroot_LQ"])
        img_LR = util.read_img(
            self.LR_env if self.is_lmdb else None, self.LR_paths[index],
            self._resolution(self.LR_sizes, index) if self.is_lmdb else None)
        if img_LR.shape[2] == 3:
            img_LR = img_LR[:, :, ::-1].copy()     # BGR→RGB like _finalize
        return clip_transform(img_LR, self.opt.get("clip_size", 224))


class CachedContextDataset:
    """Wraps a paired train dataset with PRECOMPUTED frozen DA-CLIP contexts.

    With `path.daclip` frozen, per-sample contexts are deterministic functions
    of the LQ image, so recomputing the ViT tower every training step (the
    reference's train.py:254-257 no_grad block) is pure waste on TPU.  Samples
    gain 'image_context'/'text_context' (D,) f32 arrays and drop 'LQ_clip',
    which removes the CLIP forward from the jitted train step entirely.
    Enabled by `datasets.train.cache_clip_contexts: true` (train_restoration)."""

    def __init__(self, ds, image_ctx: np.ndarray, text_ctx: np.ndarray):
        assert len(ds) == len(image_ctx) == len(text_ctx)
        self.ds = ds
        self.image_ctx = image_ctx
        self.text_ctx = text_ctx

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, index: int) -> Dict:
        s = self.ds[index]
        s.pop("LQ_clip", None)
        s["image_context"] = self.image_ctx[index]
        s["text_context"] = self.text_ctx[index]
        return s


class LQDataset:
    """Unpaired LQ images (inference without GT; LQ_dataset.py)."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.LR_paths = util.get_image_paths(opt.get("data_type"), opt["dataroot_LQ"])

    def __len__(self):
        return len(self.LR_paths)

    def __getitem__(self, index: int) -> Dict:
        LR_path = self.LR_paths[index]
        img_LR = util.read_img(None, LR_path)
        if self.opt.get("color"):
            img_LR = util.channel_convert(img_LR.shape[2], self.opt["color"], [img_LR])[0]
        out = _finalize(None, img_LR,
                        clip_res=self.opt.get("clip_size", 224))
        out["LQ_path"] = LR_path
        return out


class GTDataset:
    """GT-only with config-driven synthetic degradation (GT_dataset.py: noise
    sigma / SR scale from the `degradation:` options block)."""

    def __init__(self, opt: Dict):
        self.opt = opt
        self.phase = opt.get("phase", "train")
        self.GT_size = opt.get("patch_size")
        self.GT_paths = util.get_image_paths(opt.get("data_type"), opt["dataroot_GT"])
        self.rng = random.Random(opt.get("seed"))

    def __len__(self):
        return len(self.GT_paths)

    def __getitem__(self, index: int) -> Dict:
        from daclip_tpu.data import degradations as deg_util

        GT_path = self.GT_paths[index]
        img_GT = util.read_img(None, GT_path)
        if self.phase == "train" and self.GT_size:
            H, W, _ = img_GT.shape
            rnd_h = self.rng.randint(0, max(0, H - self.GT_size))
            rnd_w = self.rng.randint(0, max(0, W - self.GT_size))
            img_GT = img_GT[rnd_h: rnd_h + self.GT_size,
                            rnd_w: rnd_w + self.GT_size, :]
            img_GT = util.augment([img_GT], self.opt.get("use_flip", True),
                                  self.opt.get("use_rot", True), rng=self.rng)[0]
        sigma = self.opt.get("sigma", 25)
        img_LQ = deg_util.add_gaussian_noise(img_GT, sigma, rng=self.rng)
        out = _finalize(img_GT, img_LQ, self.rng,
                        self.opt.get("clip_size", 224))
        out["GT_path"] = GT_path
        return out


_REGISTRY = {"MD": MDDataset, "MDGT": MDGTDataset, "LQGT": LQGTDataset,
             "LQ": LQDataset, "GT": GTDataset}


def create_dataset(dataset_opt: Dict):
    mode = dataset_opt["mode"]
    if mode not in _REGISTRY:
        raise NotImplementedError(f"Dataset mode {mode!r} is not recognized.")
    return _REGISTRY[mode](dataset_opt)
