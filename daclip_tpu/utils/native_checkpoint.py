"""Native (torch-free) checkpoint loading — closes the train→eval→serve loop.

The reference's lifecycle is train → save → `test.py` loads what it trained
(universal-image-restoration/config/daclip-sde/test.py:24-82 via
models/base_model.py:80-105, which reads the same .pth files train.py wrote).
Our train CLIs save orbax trees (utils/checkpoint.py); this module reads them
back for every inference-side entry point (pipeline / test_restoration /
predict / evaluate_daclip / evaluate_numclip / factory), with NO torch import:
a TPU serving host needs only jax + orbax.

Checkpoint layouts (what the train CLIs write):
  restoration (cli/train_restoration.py): TrainState(params, opt_state,
      ema=EMAState(params, step), step) — orbax restores it as nested dicts.
      EMA params are served by default, matching the reference which saves and
      loads the EMA net for eval (denoising_model.py:199-201).
  DA-CLIP (cli/train_daclip.py): {params: trainable, frozen: {clip: ...},
      opt_state, step, epoch} — full model params = trainable ∪ frozen
      (train/clip_train.py:partition_daclip_params).

Also provides a portable flat-`.npz` params format (keys joined with '/') so
checkpoints can be shipped as single files without orbax on the consumer side.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# format detection


def _has_orbax_step_dirs(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for entry in os.listdir(path):
        full = os.path.join(path, entry)
        if entry.isdigit() and os.path.isdir(full):
            return True
    return False


def checkpoint_kind(path: str) -> str:
    """'orbax' (a train dir with numeric step subdirs), 'npz', or 'torch'."""
    if _has_orbax_step_dirs(path):
        return "orbax"
    if os.path.isdir(path):
        # tolerate pointing directly at one step dir (<run>/<step>/)
        parent_ok = os.path.basename(os.path.normpath(path)).isdigit()
        if parent_ok:
            return "orbax_step"
        raise FileNotFoundError(
            f"{path!r} is a directory but contains no orbax step checkpoints")
    if str(path).endswith(".npz"):
        return "npz"
    return "torch"


def is_native_checkpoint(path: str) -> bool:
    try:
        return checkpoint_kind(path) in ("orbax", "orbax_step", "npz")
    except FileNotFoundError:
        return False


# ---------------------------------------------------------------------------
# orbax train-dir loading


def load_train_tree(directory: str, step: Optional[int] = None) -> Tuple[Dict, int]:
    """Restore the raw checkpoint tree (nested dicts) + the step restored."""
    from daclip_tpu.utils.checkpoint import latest_step, restore_checkpoint

    directory = os.path.abspath(directory)
    if checkpoint_kind(directory) == "orbax_step":
        step = int(os.path.basename(os.path.normpath(directory)))
        directory = os.path.dirname(os.path.normpath(directory))
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    tree = restore_checkpoint(directory, step=step)
    return tree, int(step)


def load_restoration_params(directory: str, step: Optional[int] = None,
                            use_ema: bool = True) -> Tuple[Dict, int]:
    """UNet params from a cli/train_restoration.py checkpoint dir.

    use_ema=True serves the EMA shadow params — reference parity: the val loop
    and released `universal-ir.pth` use the EMA net (denoising_model.py:118,
    199-201; our cli/train_restoration.py vals on state.ema.params too)."""
    tree, step = load_train_tree(directory, step)
    if "ema" not in tree or "params" not in tree:
        raise ValueError(
            f"{directory!r} does not look like a restoration train dir "
            f"(keys: {sorted(tree)}); expected {{params, opt_state, ema, step}}")
    params = tree["ema"]["params"] if use_ema else tree["params"]
    return _unwrap_flax(params), step


def _unwrap_flax(params: Dict) -> Dict:
    """Strip a solitary flax variables wrapper ({'params': tree} → tree)."""
    while isinstance(params, dict) and set(params) == {"params"}:
        params = params["params"]
    return params


def load_daclip_train_params(directory: str, step: Optional[int] = None
                             ) -> Tuple[Dict, int]:
    """Full DaCLIP params (trainable ∪ frozen clip) from a
    cli/train_daclip.py checkpoint dir."""
    tree, step = load_train_tree(directory, step)
    if "params" not in tree:
        raise ValueError(f"{directory!r} has no 'params' (keys: {sorted(tree)})")
    params = dict(_unwrap_flax(tree["params"]))
    frozen = tree.get("frozen") or {}
    params.update(_unwrap_flax(frozen) if frozen else {})
    return params, step


# ---------------------------------------------------------------------------
# portable flat npz


def save_params_npz(path: str, params: Any) -> str:
    """Flatten a params pytree to a single .npz ('/'-joined keys)."""
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", params)
    np.savez(path, **flat)
    return path


def load_params_npz(path: str) -> Dict:
    out: Dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return out


# ---------------------------------------------------------------------------
# arch inference from a flax UNet param tree (the native twin of
# utils/torch_convert.infer_unet_arch, which reads torch state_dicts)


def infer_unet_arch_from_params(p: Dict) -> Dict:
    """ConditionalUNet constructor args from its flax param tree — lets
    pipeline/test CLIs load any trained checkpoint without the train YAML."""
    ic = np.asarray(p["init_conv"]["kernel"])          # (7,7,2*in_nc,nf)
    nf, in_nc = int(ic.shape[-1]), int(ic.shape[2]) // 2
    depth = len([k for k in p if k.startswith("down") and k.endswith("_block1")])
    ch_mult = [int(np.asarray(p[f"down{i}_downsample"]["kernel"]).shape[-1]) // nf
               for i in range(depth)]
    use_degra = "prompt" in p
    context_dim = (int(np.asarray(p["text_mlp_1"]["kernel"]).shape[0])
                   if use_degra else None)
    spatial_levels = [i for i in range(depth)
                      if "proj_in" in p[f"down{i}_attn"]["fn"]]
    use_image = bool(spatial_levels) or "proj_in" in p["mid_attn"]["fn"]
    if use_image and context_dim is None:
        src = (p[f"down{spatial_levels[0]}_attn"] if spatial_levels
               else p["mid_attn"])
        context_dim = int(np.asarray(
            src["fn"]["block0"]["attn2"]["to_k"]["kernel"]).shape[0])
    spatial_min = spatial_levels[0] if spatial_levels else 3
    return {
        "in_nc": in_nc,
        "out_nc": int(np.asarray(p["final_conv"]["kernel"]).shape[-1]),
        "nf": nf, "ch_mult": tuple(ch_mult), "context_dim": context_dim,
        "use_degra_context": use_degra, "use_image_context": use_image,
        "scale": 0.5 if "pre_down" in p else 1.0,
        "spatial_attn_min_level": spatial_min,
    }


# ---------------------------------------------------------------------------
# dispatchers used by the CLIs / factory


def load_unet_any(path: str, step: Optional[int] = None, use_ema: bool = True
                  ) -> Tuple[Dict, Dict]:
    """(unet_params, arch) from an orbax train dir, .npz, or torch .pth."""
    kind = checkpoint_kind(path)
    if kind in ("orbax", "orbax_step"):
        params, _ = load_restoration_params(path, step, use_ema=use_ema)
    elif kind == "npz":
        params = load_params_npz(path)
    else:
        from daclip_tpu.utils.torch_convert import (convert_unet,
                                                    infer_unet_arch,
                                                    load_torch_state_dict)
        sd = load_torch_state_dict(path)
        arch = infer_unet_arch(sd)
        return convert_unet(sd, depth=len(arch["ch_mult"])), arch
    return params, infer_unet_arch_from_params(params)


def load_daclip_any(path: str, image_size: Optional[int] = None,
                    patch_size: Optional[int] = None,
                    step: Optional[int] = None) -> Dict:
    """Full DaCLIP params from an orbax train dir, .npz, or torch .pt.

    image_size/patch_size are only used by the torch converter (pos-embed
    resize); native checkpoints are already in our layout."""
    kind = checkpoint_kind(path)
    if kind in ("orbax", "orbax_step"):
        params, _ = load_daclip_train_params(path, step)
        return params
    if kind == "npz":
        return load_params_npz(path)
    from daclip_tpu.utils.torch_convert import (convert_daclip,
                                                load_torch_state_dict)
    return convert_daclip(load_torch_state_dict(path), image_size, patch_size)
