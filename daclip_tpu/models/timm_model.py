"""timm vision-tower adapter (reference: open_clip/timm_model.py:28-149).

The reference wraps arbitrary `timm` backbones as CLIP vision towers
(`vision_cfg.timm_model_name`).  timm is torch-only and not part of this TPU
image, but the convnext_* family — the only timm family among the vendored
model configs with a sane TPU mapping — is implemented natively in flax
(models/convnext.py, NHWC depthwise/pointwise convs).  Everything else
(EVA / swin / vit_* timm variants) gates cleanly with migration guidance.

This module is the compatibility entry point matching the reference's class
name; `CLIP.setup` dispatches through `convnext.build_timm_tower` directly.
"""
from __future__ import annotations

from daclip_tpu.models.convnext import build_timm_tower


def TimmModel(model_name: str, embed_dim: int = 512, image_size: int = 224,
              pool: str = "", proj: str = "linear", drop: float = 0.0,
              drop_path=None, **_ignored):
    """Reference-signature factory (timm_model.py:33-46): returns a flax
    module for convnext_*, raises ImportError for torch-only families."""
    return build_timm_tower(model_name, embed_dim, pool=pool, proj=proj,
                            drop=drop, drop_path=drop_path,
                            image_size=image_size)
