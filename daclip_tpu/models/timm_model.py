"""timm vision-tower adapter (reference: open_clip/timm_model.py:28-149).

The reference wraps arbitrary `timm` backbones as CLIP vision towers
(`vision_cfg.timm_model_name`).  timm is torch-only and is not part of this
TPU image; none of the DA-CLIP / IR checkpoints or configs use a timm tower
(grep-verified: no `timm_model_name` in any shipped model_configs the
pipelines load).  This adapter therefore GATES cleanly rather than silently
mis-building: constructing it raises with migration guidance.

For users who need a non-ViT vision tower on TPU, the supported equivalents
are the built-in `ModifiedResNet` (models/resnet.py, covers RN50/101
checkpoints) or any flax backbone dropped in via `CLIP`'s visual attribute.
"""
from __future__ import annotations


class TimmModel:
    """Raises on construction: timm backbones are torch-only."""

    def __init__(self, model_name: str, *args, **kwargs):
        raise ImportError(
            f"timm tower {model_name!r} requested, but timm is a torch-only "
            "dependency and is not available in the TPU runtime. Use a ViT "
            "config (models/clip.py registry), ModifiedResNet (RN50/101), or "
            "contribute a flax backbone. To convert a timm-towered open_clip "
            "checkpoint, export its state_dict in torch and add a converter "
            "in utils/torch_convert.py.")
