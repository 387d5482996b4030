"""End-to-end DA-CLIP universal image restoration pipeline — the `predict.py`
north-star API (reference predict.py:33-91, call stack SURVEY.md §3.1).

Flow per image:
  1. host: cv2/PIL decode → RGB [0,1] float; CLIP view via clip_transform
     (predict.py:63-64,94-106),
  2. device: DaCLIP encode_image(control=True) → (image_context, degra_context)
     (predict.py:66-69),
  3. device: x_T = LQ + σ_max·ε; 100-step posterior (or sde/ode) sampler as one
     jitted lax.scan (predict.py:71-84 → sde_utils.py:297-313),
  4. host: tensor2img-compatible rounding (utils/img_utils.py:136-163).

TPU-native additions (the reference processes arbitrary sizes eagerly):
  * shape buckets — images are reflect-padded up to a small set of H×W buckets so
    recompiles are bounded; crops back after sampling,
  * overlap-tiled sampling for high-res inputs (Wild-IR config), feathered blend.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from daclip_tpu.models import CLIPCfg, DaCLIP, get_model_config
from daclip_tpu.models.unet import ConditionalUNet
from daclip_tpu.sde import IRSDE
from daclip_tpu.transforms import clip_transform
from daclip_tpu.utils.metrics import array2img


def default_buckets(max_size: int = 1024, step: int = 64):
    return [step * i for i in range(1, max_size // step + 1)]


def _bucketize(x: int, buckets) -> int:
    for b in buckets:
        if b >= x:
            return b
    return int(math.ceil(x / buckets[0]) * buckets[0])


def _adaptive_tile_axis(D: int, ts_max: int, ov: int, step: int, sizes=None):
    """Minimum-count, then minimum-size, tile grid covering one axis.

    Returns evenly spaced positions and a single tile size t ≤ ts_max
    (a multiple of `step`) such that the tiles cover D with ≥ ov overlap.
    E.g. D=1024, ts_max=512, ov=64 → 3 tiles of **384** (1.27× pixel
    coverage) where the fixed-size grid sampled 3 tiles of 512 (2.25×):
    same tile count, ~44% less sampler compute with the same blend
    geometry (tile count, coverage, feathered overlap — tiles DO see
    less spatial context; measured PSNR delta in BASELINE.md round 4).

    `sizes`: optional ascending tile-size bucket set — t snaps UP to the
    smallest member ≥ t, bounding the number of distinct compiled sampler
    shapes when serving mixed resolutions (each (tsh, tsw) pair is its
    own ~minutes-long compile on the remote TPU service).
    """
    if ts_max >= step:
        # floor to a step multiple so the returned t (capped at ts_max
        # below) always honors the "multiple of step" contract; n computed
        # from the floored max still guarantees the needed t fits under it
        ts_max -= ts_max % step

    def snap(t):
        # snap UP to the smallest bucket ≥ t that still fits under ts_max
        if sizes:
            for s in sorted(sizes):
                if t <= s <= ts_max:
                    return int(s)
        return t

    if D <= ts_max:
        return [0], snap(int(math.ceil(D / step) * step))
    n = int(math.ceil((D - ov) / (ts_max - ov)))
    t = int(math.ceil(max((D + (n - 1) * ov) / n, 2 * ov) / step) * step)
    t = snap(min(t, ts_max))
    return [int(round(i * (D - t) / (n - 1))) for i in range(n)], t


@dataclasses.dataclass
class RestorerConfig:
    model_name: str = "daclip_ViT-B-32"
    # UNet (options/test.yml network_G.setting)
    nf: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 4, 8)
    context_dim: int = 512
    use_degra_context: bool = True
    use_image_context: bool = True
    scale: float = 1.0                    # wild-ir: 0.5
    spatial_attn_min_level: int = 3
    # SDE (options/test.yml sde)
    max_sigma: float = 50
    T: int = 100
    sample_T: int = -1
    schedule: str = "cosine"
    eps: float = 0.005
    sampling_mode: str = "posterior"      # posterior | sde | ode
    # runtime
    dtype: str = "bfloat16"
    buckets_step: int = 64
    tile_size: int = 512                  # tiled sampling threshold/size
    tile_overlap: int = 64
    tile_batch: int = 8                   # tiles sampled per device program
    # adaptive tile sizes snap UP to this set (bounds distinct compiled
    # sampler shapes under mixed-resolution serving); None → derived as
    # step-floored {tile_size/2, 3·tile_size/4, tile_size}, e.g. {256,384,512}
    tile_size_buckets: Optional[Tuple[int, ...]] = None


class DACLIPRestorer:
    """Holds converted params + jit caches; `restore()` is the predict() parity
    entry point."""

    def __init__(self, cfg: RestorerConfig, unet_params, daclip_params):
        self.cfg = cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        self.unet = ConditionalUNet(
            nf=cfg.nf, ch_mult=tuple(cfg.ch_mult), context_dim=cfg.context_dim,
            use_degra_context=cfg.use_degra_context,
            use_image_context=cfg.use_image_context, scale=cfg.scale,
            spatial_attn_min_level=cfg.spatial_attn_min_level, dtype=dtype)
        clip_cfg = CLIPCfg.from_dict(get_model_config(cfg.model_name))
        self.daclip = DaCLIP(clip_cfg, dtype=dtype) if daclip_params is not None else None
        self.unet_params = jax.tree.map(jnp.asarray, unet_params)
        self.daclip_params = (jax.tree.map(jnp.asarray, daclip_params)
                              if daclip_params is not None else None)
        self.sde = IRSDE(max_sigma=cfg.max_sigma, T=cfg.T, sample_T=cfg.sample_T,
                         schedule=cfg.schedule, eps=cfg.eps)
        self.buckets = default_buckets(step=cfg.buckets_step)
        self._text_feature_cache: Dict[tuple, np.ndarray] = {}

        # params enter the jitted programs as ARGUMENTS, not closure
        # constants: inlining the 150M-param CLIP as HLO constants makes a
        # program too large for remote compile services (HTTP 413 observed
        # on the axon tunnel) and bloats compile time everywhere — the same
        # fix the train step got in round 1 (frozen passed per call)
        smp = jax.jit(self._sample_impl)
        self._sample = lambda lq, key, tctx, ictx: smp(
            self.unet_params, lq, key, tctx, ictx)
        if self.daclip is not None:
            enc = jax.jit(self._encode_impl)
            self._encode = lambda img: enc(self.daclip_params, img)
        else:
            self._encode = lambda img: (None, None)

    # -- model wrappers --------------------------------------------------------
    def _encode_impl(self, daclip_params, img4clip):
        img_f, degra_f = self.daclip.apply(
            {"params": daclip_params}, img4clip, control=True, normalize=True,
            method=self.daclip.encode_image)
        return img_f.astype(jnp.float32), degra_f.astype(jnp.float32)

    def _sample_impl(self, unet_params, lq, key, tctx, ictx):
        def noise_fn(x, mu, t, text_context=None, image_context=None):
            return self.unet.apply({"params": unet_params}, x, mu, t,
                                   text_context, image_context)

        k1, k2 = jax.random.split(key)
        x_T = self.sde.noise_state(k1, lq)
        mode = self.cfg.sampling_mode
        if mode == "sde":
            return self.sde.reverse_sde(noise_fn, x_T, lq, k2,
                                        text_context=tctx, image_context=ictx)
        if mode == "ode":
            return self.sde.reverse_ode(noise_fn, x_T, lq,
                                        text_context=tctx, image_context=ictx)
        return self.sde.reverse_posterior(noise_fn, x_T, lq, k2,
                                          text_context=tctx, image_context=ictx)

    # -- public API --------------------------------------------------------------
    @classmethod
    def from_torch(cls, unet_path: str, daclip_path: str,
                   cfg: Optional[RestorerConfig] = None) -> "DACLIPRestorer":
        """Load the reference checkpoints (universal-ir.pth + daclip_ViT-B-32.pt)
        exactly like predict.py:34-56.  The UNet architecture (nf/ch_mult/
        context/scale) is inferred from the checkpoint itself and overrides the
        config, so daclip-sde and wild-ir checkpoints both load unmodified."""
        return cls.load(unet_path, daclip_path, cfg)

    @classmethod
    def from_train_dir(cls, train_dir: str, daclip: Optional[str] = None,
                       cfg: Optional[RestorerConfig] = None,
                       use_ema: bool = True,
                       step: Optional[int] = None) -> "DACLIPRestorer":
        """Serve a model THIS framework trained: `train_dir` is the orbax
        checkpoint dir written by cli/train_restoration.py.  EMA params by
        default — reference parity: eval/serving uses the EMA net
        (denoising_model.py:118,199-201).  `daclip` may be a torch .pt, a
        cli/train_daclip.py orbax dir, a flat .npz, or None (trains/serves
        context-free UNets).  No torch import on the native path."""
        return cls.load(train_dir, daclip, cfg, use_ema=use_ema, step=step)

    @classmethod
    def load(cls, unet: str, daclip: Optional[str] = None,
             cfg: Optional[RestorerConfig] = None, use_ema: bool = True,
             step: Optional[int] = None) -> "DACLIPRestorer":
        """Format-dispatching constructor: each of `unet` / `daclip` may be a
        torch checkpoint file, an orbax train dir (ours), or a flat .npz
        (utils/native_checkpoint.py)."""
        from daclip_tpu.utils.native_checkpoint import (load_daclip_any,
                                                        load_unet_any)
        cfg = cfg or RestorerConfig()
        unet_params, arch = load_unet_any(unet, step=step, use_ema=use_ema)
        cfg = dataclasses.replace(
            cfg, nf=arch["nf"], ch_mult=arch["ch_mult"],
            context_dim=arch["context_dim"],
            use_degra_context=arch["use_degra_context"],
            use_image_context=arch["use_image_context"], scale=arch["scale"],
            spatial_attn_min_level=arch["spatial_attn_min_level"])
        daclip_params = None
        if daclip is not None:
            clip_cfg = CLIPCfg.from_dict(get_model_config(cfg.model_name))
            v = clip_cfg.vision
            daclip_params = load_daclip_any(
                daclip, v.image_size, v.patch_size if not v.is_resnet else None)
            # the fork's regression head is not used in restoration; our DaCLIP
            # here is built without it, so drop the params if present
            daclip_params = dict(daclip_params)
            daclip_params.pop("predictor", None)
        else:
            cfg = dataclasses.replace(cfg, use_degra_context=False,
                                      use_image_context=False)
        return cls(cfg, unet_params, daclip_params)

    def contexts(self, image_rgb: np.ndarray):
        """CLIP contexts from the LQ image ([0,1] float RGB HWC)."""
        if self.daclip is None:
            return None, None
        view = clip_transform(image_rgb, self.daclip.cfg.vision.image_size)[None]
        img_ctx, degra_ctx = self._encode(jnp.asarray(view))
        if not self.cfg.use_image_context:
            img_ctx = None
        if not self.cfg.use_degra_context:
            degra_ctx = None
        return img_ctx, degra_ctx

    def restore(self, image_rgb: np.ndarray, seed: int = 0,
                return_uint8: bool = True):
        """Restore a single [0,1] float RGB HWC image of any size."""
        H, W = image_rgb.shape[:2]
        img_ctx, degra_ctx = self.contexts(image_rgb)
        key = jax.random.PRNGKey(seed)

        if max(H, W) > self.cfg.tile_size:
            out = self._restore_tiled(image_rgb, key, img_ctx, degra_ctx)
        else:
            bh = _bucketize(H, self.buckets)
            bw = _bucketize(W, self.buckets)
            lq = np.pad(image_rgb, ((0, bh - H), (0, bw - W), (0, 0)),
                        mode="reflect") if (bh != H or bw != W) else image_rgb
            out = self._sample(jnp.asarray(lq[None], jnp.float32), key,
                               degra_ctx, img_ctx)
            out = np.asarray(out[0, :H, :W])
        if return_uint8:
            return array2img(out)  # [0,255] uint8 BGR like the reference
        return np.clip(out, 0, 1)

    def restore_batch(self, images_rgb, seed: int = 0, return_uint8: bool = True):
        """Throughput-oriented batched restoration: groups same-bucket images
        into one sampler call (the per-conv fixed cost on TPU is batch-
        independent — see BASELINE.md — so batching is the main serving lever).

        images_rgb: list of [0,1] float RGB HWC arrays (any sizes ≤ tile_size).
        Returns a list in input order.
        """
        from collections import defaultdict

        groups = defaultdict(list)
        for idx, img in enumerate(images_rgb):
            H, W = img.shape[:2]
            if max(H, W) > self.cfg.tile_size:
                groups[("tiled", idx)].append(idx)
            else:
                bh = _bucketize(H, self.buckets)
                bw = _bucketize(W, self.buckets)
                groups[(bh, bw)].append(idx)

        outs: Dict[int, np.ndarray] = {}
        key = jax.random.PRNGKey(seed)
        for gi, (bucket, idxs) in enumerate(groups.items()):
            if bucket[0] == "tiled":
                i = bucket[1]
                outs[i] = self.restore(images_rgb[i], seed=seed,
                                       return_uint8=False)
                continue
            bh, bw = bucket
            batch, views = [], []
            for i in idxs:
                img = images_rgb[i]
                H, W = img.shape[:2]
                batch.append(np.pad(img, ((0, bh - H), (0, bw - W), (0, 0)),
                                    mode="reflect")
                             if (bh != H or bw != W) else img)
                if self.daclip is not None:
                    views.append(clip_transform(
                        img, self.daclip.cfg.vision.image_size))
            # ONE batched CLIP encode for the whole group (per-image batch-1
            # encodes cost B separate device dispatches for identical results)
            if self.daclip is not None:
                ictx, dctx = self._encode(jnp.asarray(np.stack(views)))
            else:
                ictx = dctx = None
            if not self.cfg.use_image_context:
                ictx = None
            if not self.cfg.use_degra_context:
                dctx = None
            lq = jnp.asarray(np.stack(batch), jnp.float32)
            # fold in the group ORDINAL: bucket dims can collide (64·128 ==
            # 128·64) and would correlate noise across groups
            out = np.asarray(self._sample(lq, jax.random.fold_in(key, gi),
                                          dctx, ictx))
            for j, i in enumerate(idxs):
                H, W = images_rgb[i].shape[:2]
                outs[i] = out[j, :H, :W]
        if return_uint8:
            return [array2img(outs[i]) for i in range(len(images_rgb))]
        return [np.clip(outs[i], 0, 1) for i in range(len(images_rgb))]

    def shard_tiles(self, mesh, axis: str = "data"):
        """Shard tiled sampling over a device mesh: tile batches are laid out
        on `axis` so each chip restores its own tiles SPMD — a single high-res
        image scales across chips (batch-of-tiles data parallelism; see
        SURVEY.md §5 'long-context': spatial pressure → tiling, sharded).
        Pass tile_batch as a multiple of the axis size."""
        from jax.sharding import NamedSharding, PartitionSpec

        self._tile_sharding = NamedSharding(mesh, PartitionSpec(axis))
        return self

    def _restore_tiled(self, image_rgb, key, img_ctx, degra_ctx):
        """Overlap-tiled sampling with feathered blending for high-res inputs
        (the TPU answer to Wild-IR's full-image processing — SURVEY.md §5
        'long-context').  Tiles are sampled as BATCHES of cfg.tile_batch in one
        device program (much better chip utilisation than per-tile calls), and
        the batch is sharded over a mesh when `shard_tiles` was called."""
        H, W = image_rgb.shape[:2]
        ts, ov = self.cfg.tile_size, self.cfg.tile_overlap
        acc = np.zeros((H, W, 3), np.float64)
        wacc = np.zeros((H, W, 1), np.float64)
        # Minimum-count/minimum-size grid per axis: tile size adapts DOWN to
        # what the evenly spaced minimum tile count actually needs, instead of
        # always sampling ts-sized tiles (the fixed grid covered a 1024² input
        # 2.25× over; this grid covers it 1.27× — measured 27.6 → 10.6 s at
        # T=100 on-chip, BASELINE.md round 3).
        step = self.cfg.buckets_step
        sizes = self.cfg.tile_size_buckets
        if sizes is None:
            sizes = sorted({max(s - s % step, step)
                            for s in (ts // 2, 3 * ts // 4, ts)})
        ys, tsh = _adaptive_tile_axis(H, ts, ov, step, sizes)
        xs, tsw = _adaptive_tile_axis(W, ts, ov, step, sizes)
        if ov > 0:
            rh = np.minimum(np.arange(1, tsh + 1), ov) / ov
            rw = np.minimum(np.arange(1, tsw + 1), ov) / ov
            win2d = np.minimum.outer(np.minimum(rh, rh[::-1]),
                                     np.minimum(rw, rw[::-1]))[..., None]
        else:  # tile_overlap=0: hard tile edges, uniform weights (no 0/0 NaN)
            win2d = np.ones((tsh, tsw, 1))
        coords, tiles = [], []
        for yi in ys:
            for xi in xs:
                tile = image_rgb[yi: yi + tsh, xi: xi + tsw]
                th, tw = tile.shape[:2]
                pt = np.pad(tile, ((0, tsh - th), (0, tsw - tw), (0, 0)),
                            mode="reflect") if (th < tsh or tw < tsw) else tile
                coords.append((yi, xi, th, tw))
                tiles.append(pt)
        bs = max(1, self.cfg.tile_batch)
        sharding = getattr(self, "_tile_sharding", None)
        s = 0
        while s < len(tiles):
            # power-of-two batch buckets descending from tile_batch: the
            # remainder runs in the largest bucket that fits instead of being
            # padded up to tile_batch (a 1024² image is 9 tiles — fixed-batch-8
            # padding burned 7/16 slots, 43.8 s → 9/9 slots; BASELINE.md).
            # ≤ log2(tile_batch)+1 distinct compiled shapes, zero padding.
            # Sharded tile batches stay at full tile_batch (must stay divisible
            # by the mesh axis).
            n_left = len(tiles) - s
            n = bs
            if sharding is None:
                while n > n_left:
                    n //= 2
            chunk = tiles[s: s + n]
            if len(chunk) < n:  # sharded remainder: pad (outputs discarded)
                chunk = chunk + [chunk[-1]] * (n - len(chunk))
            dev = jnp.asarray(np.stack(chunk), jnp.float32)
            if sharding is not None:
                dev = jax.device_put(dev, sharding)
            out = np.asarray(self._sample(dev, jax.random.fold_in(key, s),
                                          degra_ctx, img_ctx))
            for j in range(min(n, n_left)):
                yi, xi, th, tw = coords[s + j]
                w = win2d[:th, :tw]
                acc[yi: yi + th, xi: xi + tw] += out[j, :th, :tw] * w
                wacc[yi: yi + th, xi: xi + tw] += w
            s += n
        return acc / np.maximum(wacc, 1e-8)

    def text_features(self, class_names) -> np.ndarray:
        """Encoded+normalized text features for class names, cached per restorer
        (the prompt set is a per-restorer constant — re-encoding per image was
        the same per-step waste the reference has at daclip_model.py:147)."""
        key = tuple(class_names)
        if key not in self._text_feature_cache:
            from daclip_tpu.tokenizer import tokenize
            toks = jnp.asarray(tokenize(
                list(class_names),
                context_length=self.daclip.cfg.text.context_length))
            self._text_feature_cache[key] = np.asarray(
                self.daclip.apply({"params": self.daclip_params}, toks,
                                  normalize=True,
                                  method=self.daclip.encode_text),
                np.float32)
        return self._text_feature_cache[key]

    def classify_degradation(self, image_rgb: np.ndarray, class_names=None):
        """Zero-shot degradation classification from degra features — the
        evaluate_daclip.py:63-104 flow; returns (best_name, probs dict)."""
        if self.daclip is None:
            raise ValueError("this restorer was loaded without a DA-CLIP "
                             "checkpoint; classification needs one")
        class_names = class_names or DEGRADATION_CLASSES
        img_ctx, degra_ctx = self._encode(
            jnp.asarray(clip_transform(image_rgb,
                                       self.daclip.cfg.vision.image_size)[None]))
        text_f = jnp.asarray(self.text_features(class_names))
        sims = jnp.einsum("d,kd->k", degra_ctx[0] /
                          jnp.linalg.norm(degra_ctx[0]), text_f)
        probs = jax.nn.softmax(100.0 * sims)
        order = np.argsort(-np.asarray(probs))
        return class_names[int(order[0])], {
            class_names[i]: float(probs[i]) for i in order}


# 10 distortion types of the universal-ir model (options/train.yml:5)
DEGRADATION_CLASSES = ["motion-blurry", "hazy", "jpeg-compressed", "low-light",
                       "noisy", "raindrop", "rainy", "shadowed", "snowy",
                       "uncompleted"]
