"""timm vision-tower adapter (reference: open_clip/timm_model.py:28-149).

The reference wraps arbitrary `timm` backbones as CLIP vision towers
(`vision_cfg.timm_model_name`).  timm is torch-only and not part of this TPU
image; every timm family the vendored model configs name is implemented
natively in flax instead — convnext_* (models/convnext.py), eva*/eva02_*
(models/eva.py), swin_base_patch4_window7_224 (models/swin.py), and
vit_{medium_patch16_gap_256,relpos_medium_patch16_cls_224}
(models/timm_vit.py) — each parity-pinned against a torch-functional
oracle.  Unknown timm backbones raise ImportError with migration guidance.

This module is the compatibility entry point matching the reference's class
name; `CLIP.setup` dispatches through `convnext.build_timm_tower` directly.
"""
from __future__ import annotations

from daclip_tpu.models.convnext import build_timm_tower


def TimmModel(model_name: str, embed_dim: int = 512, image_size: int = 224,
              pool: str = "", proj: str = "linear", drop: float = 0.0,
              drop_path=None, **_ignored):
    """Reference-signature factory (timm_model.py:33-46): returns a flax
    module for the natively implemented families, raises ImportError for
    unknown timm backbones."""
    return build_timm_tower(model_name, embed_dim, pool=pool, proj=proj,
                            drop=drop, drop_path=drop_path,
                            image_size=image_size)
