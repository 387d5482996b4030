"""CLIP and DaCLIP models (flax), plus the fork's degradation-level predictor head.

Single model library replacing the reference's two ~95%-identical vendored
open_clip copies (SURVEY.md §1): the predictor head is an optional component.

Reference parity:
  CLIP                          — universal-image-restoration/open_clip/model.py:187-264
  DaCLIP                        — universal-image-restoration/open_clip/daclip_model.py:17-76
  MultiTypeDegradationPredictor — da-clip/src/open_clip/daclip_model.py:17-81
  model config registry         — open_clip/factory.py:34-75 + model_configs/*.json
"""
from __future__ import annotations

import copy
import dataclasses
import json
import math
import pathlib
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from daclip_tpu.models.transformer import TextTransformer, VisionTransformer

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VisionCfg:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: Any = 12            # int → ViT depth; tuple → ModifiedResNet stages
    head_width: int = 64
    mlp_ratio: float = 4.0
    global_average_pool: bool = False
    # CoCa vision tower (coca_*.json configs; transformer.py:385-389)
    attentional_pool: bool = False
    n_queries: int = 256
    attn_pooler_heads: int = 8
    output_tokens: bool = False
    # train-time patch dropout fraction (model.py:33; set via the factory's
    # force_patch_dropout or a config's patch_dropout key)
    patch_dropout: float = 0.0
    # LayerScale init (ViT-M-16-alt.json; transformer.py:36-44)
    ls_init_value: Optional[float] = None
    # timm vision tower keys (convnext_*/swin_*/EVA*/vit_*_224 configs) —
    # carried so get_model_config round-trips; building one raises the gated
    # torch-only-dependency error from models/timm_model.py
    timm_model_name: Optional[str] = None
    timm_model_pretrained: bool = False
    timm_pool: str = "avg"
    timm_proj: str = "linear"
    timm_drop: float = 0.0
    timm_drop_path: Optional[float] = None

    @property
    def is_resnet(self) -> bool:
        return isinstance(self.layers, (tuple, list))

    @property
    def heads(self) -> int:
        if self.is_resnet:  # model.py:114: vision_heads = width*32 // head_width
            return self.width * 32 // self.head_width
        return self.width // self.head_width


@dataclasses.dataclass(frozen=True)
class TextCfg:
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    # CoCa text tower (transformer.py:572-575)
    embed_cls: bool = False
    pad_id: int = 0
    output_tokens: bool = False
    # HF text tower keys (roberta-/mt5-/xlm-roberta- configs; hf_model.py:46-193)
    hf_model_name: Optional[str] = None
    hf_tokenizer_name: Optional[str] = None
    proj: str = "linear"
    pooler_type: str = "mean_pooler"


@dataclasses.dataclass(frozen=True)
class CLIPCfg:
    embed_dim: int = 512
    vision: VisionCfg = dataclasses.field(default_factory=VisionCfg)
    text: TextCfg = dataclasses.field(default_factory=TextCfg)
    quick_gelu: bool = False
    # standalone-text-tower variant (model.py:267-320; factory.py:183-194 sets
    # this for custom_text configs and any hf_model_name text tower)
    custom_text: bool = False

    @staticmethod
    def from_dict(d: Dict) -> "CLIPCfg":
        v = {k: v for k, v in d.get("vision_cfg", {}).items()
             if k in {f.name for f in dataclasses.fields(VisionCfg)}}
        t = {k: v for k, v in d.get("text_cfg", {}).items()
             if k in {f.name for f in dataclasses.fields(TextCfg)}}
        return CLIPCfg(embed_dim=d["embed_dim"], vision=VisionCfg(**v),
                       text=TextCfg(**t), quick_gelu=bool(d.get("quick_gelu", False)),
                       custom_text=bool(d.get("custom_text", False)))


# -- model config registry (data mirrors open_clip/model_configs/*.json) -----------
_MODEL_CONFIGS: Dict[str, Dict] = {
    "ViT-B-32": {
        "embed_dim": 512,
        "vision_cfg": {"image_size": 224, "layers": 12, "width": 768, "patch_size": 32},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 512,
                     "heads": 8, "layers": 12},
    },
    "ViT-B-16": {
        "embed_dim": 512,
        "vision_cfg": {"image_size": 224, "layers": 12, "width": 768, "patch_size": 16},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 512,
                     "heads": 8, "layers": 12},
    },
    "ViT-L-14": {
        "embed_dim": 768,
        "vision_cfg": {"image_size": 224, "layers": 24, "width": 1024, "patch_size": 14},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 768,
                     "heads": 12, "layers": 12},
    },
    "RN50": {
        "embed_dim": 1024,
        "vision_cfg": {"image_size": 224, "layers": [3, 4, 6, 3], "width": 64},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 512,
                     "heads": 8, "layers": 12},
    },
    "RN101": {
        "embed_dim": 512,
        "vision_cfg": {"image_size": 224, "layers": [3, 4, 23, 3], "width": 64},
        "text_cfg": {"context_length": 77, "vocab_size": 49408, "width": 512,
                     "heads": 8, "layers": 12},
    },
}
_MODEL_CONFIGS["coca_ViT-B-32"] = {
    "embed_dim": 512,
    "vision_cfg": {"image_size": 224, "layers": 12, "width": 768, "patch_size": 32,
                   "attentional_pool": True, "attn_pooler_heads": 8,
                   "output_tokens": True},
    "text_cfg": {"context_length": 76, "vocab_size": 49408, "width": 512,
                 "heads": 8, "layers": 12, "embed_cls": True,
                 "output_tokens": True},
    "multimodal_cfg": {"context_length": 76, "vocab_size": 49408, "width": 512,
                       "heads": 8, "layers": 12, "attn_pooler_heads": 8},
}
_MODEL_CONFIGS["coca_ViT-L-14"] = {
    "embed_dim": 768,
    "vision_cfg": {"image_size": 224, "layers": 24, "width": 1024, "patch_size": 14,
                   "attentional_pool": True, "attn_pooler_heads": 8,
                   "output_tokens": True},
    "text_cfg": {"context_length": 76, "vocab_size": 49408, "width": 768,
                 "heads": 12, "layers": 12, "embed_cls": True,
                 "output_tokens": True},
    "multimodal_cfg": {"context_length": 76, "vocab_size": 49408, "width": 768,
                       "heads": 12, "layers": 12, "attn_pooler_heads": 12},
}
# tiny config for smoke tests / CI (not part of reference parity)
_MODEL_CONFIGS["test-tiny"] = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16,
                   "head_width": 32},
    "text_cfg": {"context_length": 16, "vocab_size": 49408, "width": 32,
                 "heads": 2, "layers": 2},
}
_MODEL_CONFIGS["coca_test-tiny"] = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16,
                   "head_width": 32, "attentional_pool": True,
                   "attn_pooler_heads": 4, "n_queries": 9, "output_tokens": True},
    "text_cfg": {"context_length": 15, "vocab_size": 49408, "width": 32,
                 "heads": 2, "layers": 2, "embed_cls": True,
                 "output_tokens": True},
    "multimodal_cfg": {"context_length": 15, "vocab_size": 49408, "width": 32,
                       "heads": 2, "layers": 2},
}
# daclip_* names reuse the underlying tower config (factory.py:191-192,225-227)
for _name in ["ViT-B-32", "ViT-B-16", "ViT-L-14", "test-tiny"]:
    _MODEL_CONFIGS[f"daclip_{_name}"] = _MODEL_CONFIGS[_name]

# full vendored registry — the reference's open_clip/model_configs/*.json
# (63 files, config data only); the literals above take precedence.
_ASSET_CONFIG_DIR = pathlib.Path(__file__).parent.parent / "assets" / "model_configs"
if _ASSET_CONFIG_DIR.is_dir():
    for _f in sorted(_ASSET_CONFIG_DIR.glob("*.json")):
        _MODEL_CONFIGS.setdefault(_f.stem, json.loads(_f.read_text()))


def list_models():
    return sorted(_MODEL_CONFIGS)


def add_model_config(path):
    """Register extra model configs from a json file or directory of them."""
    path = pathlib.Path(path)
    files = [path] if path.is_file() else sorted(path.glob("*.json"))
    for f in files:
        cfg = json.loads(f.read_text())
        if all(k in cfg for k in ("embed_dim", "vision_cfg", "text_cfg")):
            _MODEL_CONFIGS[f.stem] = cfg


def get_model_config(name: str) -> Dict:
    name = name.replace("/", "-")
    if name not in _MODEL_CONFIGS:
        raise KeyError(f"unknown model {name!r}; available: {list_models()}")
    # deep copy: callers mutate nested vision_cfg/text_cfg dicts (factory
    # force_* overrides); a shallow dict() leaked those writes into the
    # shared registry (and into daclip_* aliases of the same object)
    return copy.deepcopy(_MODEL_CONFIGS[name])


class CLIP(nn.Module):
    """Dual-tower contrastive model (model.py:187-264)."""
    cfg: CLIPCfg
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        v = self.cfg.vision
        if v.timm_model_name:  # model.py:100-111 timm dispatch
            # every vendored timm family builds natively: convnext_*
            # (models/convnext.py), eva* (models/eva.py), swin
            # (models/swin.py), vit_* (models/timm_vit.py)
            from daclip_tpu.models.convnext import build_timm_tower
            self.visual = build_timm_tower(
                v.timm_model_name, self.cfg.embed_dim, pool=v.timm_pool,
                proj=v.timm_proj, drop=v.timm_drop,
                drop_path=v.timm_drop_path, image_size=v.image_size,
                remat=self.remat, dtype=self.dtype)
        elif v.is_resnet:   # model.py:113-121: list layers → ModifiedResNet
            from daclip_tpu.models.resnet import ModifiedResNet
            self.visual = ModifiedResNet(
                layers=tuple(v.layers), output_dim=self.cfg.embed_dim,
                heads=v.heads, image_size=v.image_size, width=v.width,
                dtype=self.dtype)
        else:
            self.visual = VisionTransformer(
                image_size=v.image_size, patch_size=v.patch_size, width=v.width,
                layers=v.layers, heads=v.heads, mlp_ratio=v.mlp_ratio,
                output_dim=self.cfg.embed_dim, quick_gelu=self.cfg.quick_gelu,
                global_average_pool=v.global_average_pool,
                patch_dropout=v.patch_dropout, ls_init_value=v.ls_init_value,
                remat=self.remat, dtype=self.dtype)
        t = self.cfg.text
        self.text = TextTransformer(
            context_length=t.context_length, vocab_size=t.vocab_size,
            width=t.width, heads=t.heads, layers=t.layers, mlp_ratio=t.mlp_ratio,
            output_dim=self.cfg.embed_dim, quick_gelu=self.cfg.quick_gelu,
            remat=self.remat, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(math.log(1 / 0.07), jnp.float32))

    @staticmethod
    def _norm(x, normalize: bool):
        if not normalize:
            return x
        return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                   keepdims=True).astype(x.dtype)

    def encode_image(self, image, normalize: bool = False, control=None,
                     output_hiddens: bool = False, train: bool = False):
        # `train` enables PatchDropout in the ViT tower (needs a
        # 'patch_dropout' rng) and stochastic depth in ConvNeXt towers (only
        # when a 'drop_path' rng is supplied); ResNet has no train-time
        # behavior.
        kw = {}
        if train:
            from daclip_tpu.models.convnext import ConvNeXtTower
            if isinstance(self.visual, (VisionTransformer, ConvNeXtTower)):
                kw = {"train": True}
        out = self.visual(image, control=control, output_hiddens=output_hiddens,
                          **kw)
        if output_hiddens:
            return self._norm(out[0], normalize), out[1]
        return self._norm(out, normalize)

    def encode_text(self, text, normalize: bool = False):
        return self._norm(self.text(text), normalize)

    def __call__(self, image=None, text=None, train: bool = False):
        # `train` activates PatchDropout in the ViT tower (needs a
        # 'patch_dropout' rng in apply's rngs) — model.py:244-252 forward
        return {
            "image_features": self.encode_image(image, normalize=True,
                                                train=train)
            if image is not None else None,
            "text_features": self.encode_text(text, normalize=True)
            if text is not None else None,
            "logit_scale": jnp.exp(self.logit_scale),
        }


class CustomTextCLIP(CLIP):
    """Standalone-text-tower CLIP (model.py:267-320).

    In torch the distinction is state-dict layout (text params under a `text.`
    module vs inlined on the model); this functional library already keeps the
    text tower as its own param subtree (`text/…`), so the non-HF behavior is
    identical to `CLIP` — the class exists for API/converter parity and hosts
    the HF-text-tower dispatch (hf_model.py towers are torch/Flax-transformers
    hybrids; compose them via models/hf_text.py:HFTextTower, which needs local
    HF weights — no egress here)."""

    def setup(self):
        t = self.cfg.text
        if t.hf_model_name:
            raise ImportError(
                f"HF text tower {t.hf_model_name!r} requires local transformers "
                "weights; compose daclip_tpu.models.hf_text.HFTextTower with "
                "this model's visual tower instead (see models/hf_text.py "
                "docstring).")
        super().setup()

    def lock_image_tower(self):
        """LiT locking is the optimizer's job in this functional design: pass
        the param-path predicate to train/clip_train.py's partition (the
        reference mutates requires_grad in place, model.py:288-290)."""
        return lambda path: path and path[0] == "visual"

    def lock_text_tower(self):
        return lambda path: path and path[0] == "text"


class MultiTypeDegradationPredictor(nn.Module):
    """Degradation-level regression head (da-clip/src/open_clip/daclip_model.py:17-81).

    cosine-sim of the degradation feature against 28 = 4 types × 7 bins prompt
    embeddings, softmax(T=0.07), per-type MLP delta regressors, expectation over
    adjusted bin centers.  The 4 regressors are stacked (4,...) einsum params
    instead of a Python loop of Linear modules.
    """
    num_bins: int = 7
    num_types: int = 4
    temperature: float = 0.07
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_degra_features, all_d_type_tokens_features,
                 bin_center_features):
        # image_degra_features: (B, D); all_d_type_tokens_features: (28, D) or
        # (B, 28, D); bin_center_features: (B, 4, 7) or (4, 7).
        B, D = image_degra_features.shape
        nt, nb = self.num_types, self.num_bins
        f = image_degra_features.astype(jnp.float32)
        tokf = all_d_type_tokens_features.astype(jnp.float32)
        f = f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-8)
        tokf = tokf / (jnp.linalg.norm(tokf, axis=-1, keepdims=True) + 1e-8)
        if tokf.ndim == 2:
            sim = jnp.einsum("bd,kd->bk", f, tokf)            # (B, 28)
        else:
            sim = jnp.einsum("bd,bkd->bk", f, tokf)
        probs = jax.nn.softmax(sim / self.temperature, axis=-1)

        # per-type regressors: Linear(7→14)-ReLU-Linear(14→7)-Tanh, stacked over types
        sim_t = sim.reshape(B, nt, nb)
        w1 = self.param("reg_w1", nn.initializers.lecun_normal(), (nt, nb, 2 * nb),
                        jnp.float32)
        b1 = self.param("reg_b1", nn.initializers.zeros, (nt, 2 * nb), jnp.float32)
        w2 = self.param("reg_w2", nn.initializers.lecun_normal(), (nt, 2 * nb, nb),
                        jnp.float32)
        b2 = self.param("reg_b2", nn.initializers.zeros, (nt, nb), jnp.float32)
        h = jax.nn.relu(jnp.einsum("btn,tnm->btm", sim_t, w1) + b1)
        delta = jnp.tanh(jnp.einsum("btm,tmn->btn", h, w2) + b2)  # (B, 4, 7)

        centers = jnp.asarray(bin_center_features, jnp.float32)
        if centers.ndim == 2:
            centers = jnp.broadcast_to(centers, (B, nt, nb))
        adjusted = centers / (1.0 + delta)
        probs_t = probs.reshape(B, nt, nb)
        return jnp.sum(probs_t * adjusted, axis=-1)              # (B, 4)


class DaCLIP(nn.Module):
    """Controller architecture: frozen CLIP + controller vision tower
    (daclip_model.py:17-76; fork variant with predictor: da-clip/src/...:83-169).

    `encode_image(image, control=True)` returns (image_features, degra_features):
    the controller runs first producing per-block zero-projected hiddens, then the
    frozen CLIP ViT consumes them in REVERSED block order (`control.pop()` parity —
    see models/transformer.py docstring).
    """
    cfg: CLIPCfg
    use_predictor: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.clip = CLIP(self.cfg, remat=self.remat, dtype=self.dtype)
        v = self.cfg.vision
        self.visual_control = VisionTransformer(
            image_size=v.image_size, patch_size=v.patch_size, width=v.width,
            layers=v.layers, heads=v.heads, mlp_ratio=v.mlp_ratio,
            output_dim=self.cfg.embed_dim, quick_gelu=self.cfg.quick_gelu,
            controller=True, patch_dropout=v.patch_dropout,
            remat=self.remat, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(math.log(1 / 0.07), jnp.float32))
        if self.use_predictor:
            self.predictor = MultiTypeDegradationPredictor(dtype=self.dtype)

    def encode_image(self, image, control: bool = False,
                     normalize: bool = False, train: bool = False):
        # `train` enables PatchDropout in BOTH towers when configured; each
        # tower draws its own 'patch_dropout' rng fold, i.e. independent
        # token subsets — matching the reference, where model.train() puts
        # both (deepcopy-shared PatchDropout) towers in train mode with
        # independent torch randomness (daclip_model.py:17-38)
        if control:
            degra_features, hiddens = self.visual_control(
                image, output_hiddens=True, train=train)
            # hiddens: (L, B, N, D); Transformer flips internally for pop() parity.
            image_features = self.clip.encode_image(image, control=hiddens,
                                                    train=train)
            n = CLIP._norm
            return n(image_features, normalize), n(degra_features, normalize)
        return self.clip.encode_image(image, normalize=normalize, train=train)

    def encode_text(self, text, normalize: bool = False):
        return self.clip.encode_text(text, normalize=normalize)

    def __call__(self, image=None, text=None, gt_images=None, deg_type=None,
                 gt_val=None, bin_center_bank=None, all_d_type_tokens=None,
                 train: bool = False):
        """Training forward.

        Base DA-CLIP (daclip_model.py:60-76): pass image + text (caption‖degradation
        token concat, chunked in half).
        Fork (da-clip/src/...:128-169): additionally pass gt_images, deg_type,
        gt_val, bin_center_bank (4,7) and all_d_type_tokens (28,77) — the 28 prompt
        encodings are computed ONCE per call (the reference re-encodes them per
        sample in a Python loop, :147, a known inefficiency).
        """
        caption = degradation = None
        if text is not None:
            caption, degradation = jnp.split(text, 2, axis=-1)
        out = {"logit_scale": jnp.exp(self.logit_scale)}
        if image is not None:
            img_f, degra_f = self.encode_image(image, control=True,
                                               normalize=True, train=train)
            out["image_features"] = img_f
            out["image_degra_features"] = degra_f
        if caption is not None:
            out["text_features"] = self.encode_text(caption, normalize=True)
            out["text_degra_features"] = self.encode_text(degradation, normalize=True)
        if gt_images is not None:
            out["gt_image_features"] = self.encode_image(
                gt_images, normalize=True, train=train)
        if self.use_predictor and all_d_type_tokens is not None:
            toks = all_d_type_tokens
            if toks.ndim == 3:  # (B, 28, 77) constant bank → encode once
                toks = toks[0]
            tok_f = self.encode_text(toks, normalize=True)  # (28, D)
            out["all_d_type_tokens_features"] = tok_f
            out["bin_center_features"] = bin_center_bank
            out["pred"] = self.predictor(out["image_degra_features"], tok_f,
                                         bin_center_bank)
            out["deg_type"] = deg_type
            out["gt_val"] = gt_val
        return out
