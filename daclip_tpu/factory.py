"""Model factory — the open_clip-compatible construction API.

Reference: universal-image-restoration/open_clip/factory.py:109-404.
  * `create_model(name, pretrained=...)` — "daclip" in the name wraps CLIP in
    DaCLIP (factory.py:191-192); a pretrained *tag* loads CLIP weights then
    `initial_controller()` + `lock_clip()` (:236-239); a local *path* loads a
    full checkpoint (:241).
  * `create_model_and_transforms` / `create_model_from_pretrained` attach the
    train/val image transforms (:312-404).
  * `create_loss` dispatches on flags (:272-309).

Functional-JAX shape: these return `(model_def, params)` — a flax module
definition plus its param pytree — instead of a stateful torch module; the
transforms are host-side numpy callables.  Freezing (`lock_clip`,
daclip_model.py:36-38) is the optimizer's job here: see
train/clip_train.py, which applies `optax.multi_transform` masking so the
`clip` collection receives zero updates (stop_gradient equivalents).
"""
from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from daclip_tpu.models import (CLIP, CLIPCfg, CustomTextCLIP, DaCLIP,
                               get_model_config)
from daclip_tpu.models.pretrained import (download_pretrained,
                                          get_pretrained_cfg)
from daclip_tpu.tokenizer import tokenize
from daclip_tpu.transforms import image_transform


def _init_params(model, cfg: CLIPCfg, seed: int = 0, is_daclip: bool = False,
                 use_predictor: bool = False):
    import jax

    img = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3),
                    jnp.float32)
    if not is_daclip:
        txt = jnp.zeros((1, cfg.text.context_length), jnp.int32)
        return model.init(jax.random.PRNGKey(seed), img, txt)["params"]
    # DaCLIP.forward takes caption‖degradation concat → 2× context length
    kwargs = dict(text=jnp.zeros((1, 2 * cfg.text.context_length), jnp.int32))
    if use_predictor:  # materialise the predictor head's params too
        kwargs.update(gt_images=img, deg_type=jnp.zeros((1, 4)),
                      gt_val=jnp.zeros((1, 4)),
                      bin_center_bank=jnp.zeros((4, 7)),
                      all_d_type_tokens=jnp.zeros((28, cfg.text.context_length),
                                                  jnp.int32))
    return model.init(jax.random.PRNGKey(seed), img, **kwargs)["params"]


def create_model(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    use_predictor: Optional[bool] = None,
    cache_dir: Optional[str] = None,
    seed: int = 0,
    force_quick_gelu: bool = False,
    force_custom_text: bool = False,
    force_patch_dropout: Optional[float] = None,
    force_image_size: Optional[int] = None,
    remat: bool = False,
) -> Tuple[Any, Any]:
    """Build (model_def, params).

    `pretrained` may be a local .pt/.pth path (full checkpoint, torch or ours)
    or a registry tag ('openai', 'laion2b_s34b_b79k', ...) which is downloaded
    and cached.  For daclip_* names a tag initialises ONLY the frozen CLIP and
    copies it into the controller (two-phase semantics, factory.py:236-241).
    """
    model_name = model_name.replace("/", "-")
    is_daclip = "daclip" in model_name
    # reference precision choices (training/params.py:190-193 + open_clip's
    # pure_* variants); fp16 flavours map to bf16 — the TPU-native half type
    _PRECISIONS = {"fp32": jnp.float32, "amp": jnp.bfloat16,
                   "amp_bf16": jnp.bfloat16, "amp_bfloat16": jnp.bfloat16,
                   "bf16": jnp.bfloat16, "pure_bf16": jnp.bfloat16,
                   "fp16": jnp.bfloat16, "pure_fp16": jnp.bfloat16}
    if precision not in _PRECISIONS:
        raise ValueError(f"unknown precision {precision!r}; supported: "
                         f"{sorted(_PRECISIONS)}")
    dtype = _PRECISIONS[precision]

    if "coca" in model_name:  # factory.py:186-190 CoCa dispatch
        return _create_coca(model_name, pretrained, dtype, cache_dir, seed)

    model_dict = get_model_config(model_name)
    # config overrides (reference factory.py:160-170)
    if force_quick_gelu:
        model_dict["quick_gelu"] = True
    if force_patch_dropout is not None:
        model_dict.setdefault("vision_cfg", {})["patch_dropout"] = force_patch_dropout
    if force_image_size is not None:
        model_dict.setdefault("vision_cfg", {})["image_size"] = force_image_size
    cfg = CLIPCfg.from_dict(model_dict)
    # custom_text dispatch (factory.py:183-194): daclip keeps the standard CLIP
    # inner model even when its config says custom_text (:190-192)
    custom_text = (cfg.custom_text or force_custom_text
                   or bool(cfg.text.hf_model_name)) and not is_daclip

    if use_predictor is None:
        use_predictor = False
    # remat = --grad-checkpointing (main.py:255-258): jax.checkpoint on the
    # scanned transformer blocks instead of torch.utils.checkpoint
    if is_daclip:
        model = DaCLIP(cfg, use_predictor=use_predictor, remat=remat,
                       dtype=dtype)
    elif custom_text:
        model = CustomTextCLIP(cfg, remat=remat, dtype=dtype)
    else:
        model = CLIP(cfg, remat=remat, dtype=dtype)
    params = _init_params(model, cfg, seed, is_daclip,
                          use_predictor and is_daclip)

    if pretrained:
        from daclip_tpu.utils.native_checkpoint import (is_native_checkpoint,
                                                        load_daclip_any)
        path = Path(pretrained)
        if not path.exists():
            url_cfg = get_pretrained_cfg(model_name, pretrained)
            if not url_cfg:
                raise FileNotFoundError(
                    f"pretrained {pretrained!r} is neither a local file nor a "
                    f"known tag for {model_name!r}")
            path = Path(download_pretrained(url_cfg, cache_dir=cache_dir))
        v = cfg.vision
        ps = v.patch_size if not v.is_resnet else None
        if is_native_checkpoint(str(path)):
            # a checkpoint THIS framework trained (orbax dir from
            # cli/train_daclip.py, or flat .npz) — no torch on this path, so
            # a torch-free TPU host can serve its own training runs
            # load_daclip_any handles plain CLIP train dirs too (trainable
            # partition = the whole tree, frozen = {})
            loaded = load_daclip_any(str(path))
            if is_daclip and not use_predictor:
                loaded = dict(loaded)
                loaded.pop("predictor", None)
            params = dict(params)
            params.update(loaded)
        else:
            from daclip_tpu.utils.torch_convert import (convert_clip,
                                                        convert_daclip,
                                                        initial_controller,
                                                        load_torch_state_dict)
            sd = load_torch_state_dict(str(path))
            if is_daclip and any(k.startswith("visual_control.") for k in sd):
                loaded = convert_daclip(sd, v.image_size, ps)  # full DaCLIP ckpt
                if not use_predictor:
                    loaded.pop("predictor", None)
                params = dict(params)
                params.update(loaded)
            elif is_daclip:
                # two-phase: CLIP weights → initial_controller (factory.py:236-239)
                params = dict(params)
                params["clip"] = convert_clip(sd, v.image_size, ps)
                params = initial_controller(params)
            else:
                params = convert_clip(sd, v.image_size, ps)
    return model, params


def _create_coca(model_name, pretrained, dtype, cache_dir, seed):
    import jax

    from daclip_tpu.models.coca import CoCa, CoCaCfg

    ccfg = CoCaCfg.from_dict(get_model_config(model_name))
    model = CoCa(ccfg, dtype=dtype)
    img = jnp.zeros((1, ccfg.vision.image_size, ccfg.vision.image_size, 3),
                    jnp.float32)
    txt = jnp.zeros((1, ccfg.text.context_length + 1), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), img, txt)["params"]
    if pretrained:
        from daclip_tpu.utils.torch_convert import (convert_coca,
                                                    load_torch_state_dict)
        path = Path(pretrained)
        if not path.exists():
            url_cfg = get_pretrained_cfg(model_name, pretrained)
            if not url_cfg:
                raise FileNotFoundError(
                    f"pretrained {pretrained!r} is neither a local file nor a "
                    f"known tag for {model_name!r}")
            path = Path(download_pretrained(url_cfg, cache_dir=cache_dir))
        params = convert_coca(load_torch_state_dict(str(path)))
    return model, params


def create_model_and_transforms(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    use_predictor: Optional[bool] = None,
    cache_dir: Optional[str] = None,
    image_mean=None,
    image_std=None,
    seed: int = 0,
    force_quick_gelu: bool = False,
    force_custom_text: bool = False,
    force_patch_dropout: Optional[float] = None,
    force_image_size: Optional[int] = None,
    remat: bool = False,
):
    """(model_def, params, preprocess_train, preprocess_val) —
    factory.py:312-360."""
    model, params = create_model(model_name, pretrained, precision,
                                 use_predictor, cache_dir, seed=seed,
                                 force_quick_gelu=force_quick_gelu,
                                 force_custom_text=force_custom_text,
                                 force_patch_dropout=force_patch_dropout,
                                 force_image_size=force_image_size,
                                 remat=remat)
    cfg = model.cfg
    tag_cfg = (get_pretrained_cfg(model_name, pretrained)
               if pretrained and not Path(str(pretrained)).exists() else {})
    mean = image_mean or tag_cfg.get("mean")
    std = image_std or tag_cfg.get("std")
    pp_train = image_transform(cfg.vision.image_size, is_train=True,
                               mean=mean, std=std)
    pp_val = image_transform(cfg.vision.image_size, is_train=False,
                             mean=mean, std=std)
    return model, params, pp_train, pp_val


def create_model_from_pretrained(
    model_name: str,
    pretrained: str,
    precision: str = "fp32",
    use_predictor: Optional[bool] = None,
    cache_dir: Optional[str] = None,
    image_mean=None,
    image_std=None,
):
    """(model_def, params, preprocess) — factory.py:363-404 (val transform)."""
    model, params, _, pp_val = create_model_and_transforms(
        model_name, pretrained, precision, use_predictor, cache_dir,
        image_mean, image_std)
    return model, params, pp_val


def get_tokenizer(model_name: str = ""):
    """factory.py:101-106: the byte-BPE tokenizer bound to the model's context
    length (HF-text models use their own tokenizer — see models/hf_text.py).
    CoCa text towers consume context_length+1 tokens (one is traded for the
    appended CLS, coca_model.py:143: `text[:, :-1]`), matching the reference
    where coca text_cfg.context_length is 76 against tokenize's default 77."""
    if model_name:
        cfg = CLIPCfg.from_dict(get_model_config(model_name))
        n = cfg.text.context_length + (1 if "coca" in model_name else 0)
        return partial(tokenize, context_length=n)
    return tokenize


def create_loss(args):
    """factory.py:272-309 dispatch.  `args` needs the same attributes the
    reference reads: distill, dataset_type/coca flags, da."""
    import importlib

    # losses/__init__ re-exports the clip_loss *function*, shadowing the module
    L = importlib.import_module("daclip_tpu.losses.clip_loss")

    if getattr(args, "distill", False):
        return L.distill_clip_loss
    if "coca" in str(getattr(args, "model", "")).lower():
        return partial(L.coca_loss,
                       caption_loss_weight=getattr(args, "coca_caption_loss_weight", 2.0),
                       clip_loss_weight=getattr(args, "coca_contrastive_loss_weight", 1.0))
    if getattr(args, "da", False):
        return L.daclip_loss_fork
    if "daclip" in str(getattr(args, "model", "")).lower():
        return L.daclip_loss_uir
    return lambda out, output_dict=True: (
        {"contrastive_loss": L.clip_loss(out["image_features"],
                                         out["text_features"],
                                         out["logit_scale"])}
        if output_dict else
        L.clip_loss(out["image_features"], out["text_features"],
                    out["logit_scale"]))
