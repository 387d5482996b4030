"""Flax ConvNeXt vision tower — native TPU replacement for the timm convnext
backbones the reference wraps via open_clip/timm_model.py:28-149.

The shipped convnext_* model configs (assets/model_configs/convnext_*.json)
request `timm_pool: ""` and `timm_proj: linear|mlp`: in the reference that
means timm's default head pooling (global average → head LayerNorm) with the
classifier removed, followed by the adapter's projection to embed_dim
(timm_model.py:85-105).  This module reproduces exactly that head, on an NHWC
layout so the 7×7 depthwise convs and 1×1 pointwise (as Dense) map onto the
TPU conv/MXU emitters without transposes.

Architecture per block (ConvNeXt, Liu et al. 2022 — matches timm):
  depthwise 7×7 → LayerNorm → Dense 4·dim → GELU(erf) → Dense dim →
  layer-scale gamma (init 1e-6) → stochastic-depth residual.
Stem: 4×4/4 conv + LayerNorm; stage transitions: LayerNorm + 2×2/2 conv.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from daclip_tpu.models.layers import LayerNorm

Dtype = Any

# timm variant table: depths / dims for each convnext_* the configs name.
VARIANTS = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnext_xxlarge": ((3, 4, 30, 3), (384, 768, 1536, 3072)),
}


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    ls_init: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        x = nn.Conv(self.dim, (7, 7), padding="SAME",
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="dwconv")(x)
        x = LayerNorm(eps=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param("gamma", nn.initializers.constant(self.ls_init),
                           (self.dim,), jnp.float32)
        x = x * gamma.astype(x.dtype)
        if train and self.drop_path > 0.0 and self.has_rng("drop_path"):
            # stochastic depth: drop the whole residual branch per sample.
            # Applied only when the caller supplies a 'drop_path' rng — the
            # CLIP harness trains without one (no stochastic depth), matching
            # how it gates patch_dropout behind an explicit rng.
            keep = 1.0 - self.drop_path
            rng = self.make_rng("drop_path")
            mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
            x = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
        return shortcut + x


class ConvNeXt(nn.Module):
    """Trunk + timm-default head pooling (avg → LayerNorm), classifier removed."""
    depths: Tuple[int, ...]
    dims: Tuple[int, ...]
    drop_path_rate: float = 0.0
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        total = sum(self.depths)
        rates = [self.drop_path_rate * i / max(total - 1, 1)
                 for i in range(total)]  # linearly increasing, timm parity
        # --grad-checkpointing → per-block remat (TimmModel
        # set_grad_checkpointing parity, timm_model.py:128-130)
        block_cls = ConvNeXtBlock
        if self.remat:
            block_cls = nn.remat(ConvNeXtBlock, prevent_cse=False,
                                 static_argnums=(2,))
        bi = 0
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si == 0:
                x = nn.Conv(dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                            name="stem_conv")(x)
                x = LayerNorm(eps=1e-6, name="stem_norm")(x)
            else:
                x = LayerNorm(eps=1e-6, name=f"downsample_norm{si}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"downsample_conv{si}")(x)
            for bj in range(depth):
                x = block_cls(dim, drop_path=rates[bi], dtype=self.dtype,
                              name=f"stage{si}_block{bj}")(x, train)
                bi += 1
        x = jnp.mean(x, axis=(1, 2))           # global average pool
        x = LayerNorm(eps=1e-6, name="head_norm")(x)     # timm head.norm survives
        return x                               # reset_classifier(0): no fc


class ConvNeXtTower(nn.Module):
    """TimmModel-equivalent adapter: trunk → projection to embed_dim
    (timm_model.py:85-105, proj='linear' or 'mlp', proj_bias=False)."""
    model_name: str
    embed_dim: int
    proj: str = "linear"
    drop: float = 0.0
    drop_path: float = 0.0
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, control=None, output_hiddens: bool = False,
                 train: bool = False):
        assert control is None and not output_hiddens, (
            "ConvNeXt towers have no transformer hiddens; the DA-CLIP "
            "controller requires a ViT vision tower")
        depths, dims = VARIANTS[self.model_name]
        x = ConvNeXt(depths, dims, drop_path_rate=self.drop_path,
                     remat=self.remat, dtype=self.dtype,
                     name="trunk")(x, train=train)
        if self.proj == "linear":
            if train and self.drop > 0.0 and self.has_rng("dropout"):
                x = nn.Dropout(self.drop, deterministic=False)(x)
            x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                         name="proj")(x)
        elif self.proj == "mlp":
            # timm Mlp(prev, 2*embed, embed, drop=(drop, 0), bias=(True, False))
            x = nn.Dense(2 * self.embed_dim, dtype=self.dtype, name="mlp_fc1")(x)
            x = nn.gelu(x, approximate=False)
            if train and self.drop > 0.0 and self.has_rng("dropout"):
                x = nn.Dropout(self.drop, deterministic=False)(x)
            x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                         name="mlp_fc2")(x)
        elif self.proj:
            raise ValueError(f"unknown projection type {self.proj!r}")
        return x


def build_timm_tower(model_name: str, embed_dim: int, pool: str = "",
                     proj: Optional[str] = "linear", drop: float = 0.0,
                     drop_path: Optional[float] = None, image_size: int = 224,
                     remat: bool = False, dtype: Dtype = jnp.float32):
    """Factory for `vision_cfg.timm_model_name` towers.

    Every timm family the vendored model configs name builds natively:
    convnext_* (this module), eva_*/eva02_* (models/eva.py),
    swin_base_patch4_window7_224 (models/swin.py), and the plain-timm
    vit_medium_patch16_gap_256 / vit_relpos_medium_patch16_cls_224
    (models/timm_vit.py).  Anything else raises with migration guidance."""
    if model_name in VARIANTS:
        if pool not in ("", "avg"):
            raise ValueError(
                f"pool={pool!r} not supported for native convnext towers "
                "(timm default avg pooling only; abs_attn/rot_attn are "
                "torch-only timm layers)")
        return ConvNeXtTower(model_name=model_name, embed_dim=embed_dim,
                             proj=proj or "", drop=drop,
                             drop_path=drop_path or 0.0, remat=remat,
                             dtype=dtype)
    from daclip_tpu.models.eva import EVA_VARIANTS, EvaTower
    if model_name in EVA_VARIANTS:
        # EVA configs use adapter branch 1 (timm_model.py:58-67): the trunk's
        # classifier IS the projection; pool='token', proj must be falsy
        if pool != "token" or proj:
            raise ValueError(
                f"EVA towers implement timm_pool='token'/timm_proj=null as "
                f"the vendored configs request (got pool={pool!r}, "
                f"proj={proj!r})")
        return EvaTower(model_name=model_name, embed_dim=embed_dim,
                        image_size=image_size, remat=remat, dtype=dtype)
    from daclip_tpu.models.swin import SWIN_VARIANTS, SwinTower
    if model_name in SWIN_VARIANTS:
        if pool not in ("", "avg"):
            raise ValueError(
                f"pool={pool!r} not supported for the native swin tower "
                "(network-default avg pooling only)")
        return SwinTower(model_name=model_name, embed_dim=embed_dim,
                         image_size=image_size, proj=proj or "", drop=drop,
                         remat=remat, dtype=dtype)
    from daclip_tpu.models.timm_vit import TIMM_VIT_VARIANTS, TimmViTTower
    if model_name in TIMM_VIT_VARIANTS:
        if pool not in ("", "avg", "token"):
            raise ValueError(
                f"pool={pool!r} not supported for native timm-vit towers")
        if pool == "token" and not TIMM_VIT_VARIANTS[model_name]["class_token"]:
            raise ValueError(
                f"pool='token' requires a class token; {model_name} has none")
        if proj not in (None, "", "linear"):
            raise ValueError(
                f"proj={proj!r} not supported for native timm-vit towers "
                "(the vendored configs use proj='linear')")
        return TimmViTTower(model_name=model_name, embed_dim=embed_dim,
                            image_size=image_size, pool=pool, drop=drop,
                            remat=remat, dtype=dtype)
    raise ImportError(
        f"timm tower {model_name!r} requested: the natively implemented "
        "families are convnext_* (models/convnext.py), eva*/eva02_* "
        "(models/eva.py), swin_base_patch4_window7_224 (models/swin.py) and "
        "vit_{medium_patch16_gap_256,relpos_medium_patch16_cls_224} "
        "(models/timm_vit.py) — every family the vendored model configs "
        "name. Other timm backbones are torch-only; use a ViT config "
        "(models/clip.py registry) or contribute a flax backbone.")
