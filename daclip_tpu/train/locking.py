"""LiT-style tower locking (https://arxiv.org/abs/2111.07991).

Reference: open_clip/transformer.py:444-476 (VisionTransformer.lock),
:600-618 (TextTransformer.lock), wired by training/main.py:261-269.

The torch reference mutates `requires_grad` in place.  In this functional
harness locking is an UPDATE MASK: a pytree of float arrays (1.0 = trainable,
0.0 = locked) multiplied into the optimizer's updates after the AdamW
transform (train/clip_train.py), which freezes both gradients and weight
decay for locked leaves — exact requires_grad=False semantics.

Because the transformer blocks are nn.scan-stacked (params carry a leading
(L, …) layer axis), per-layer unlocking uses a broadcastable (L, 1, …) mask
on the stacked leaves rather than a per-leaf bool.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _layer_axis_mask(leaf, n_layers: int, unlocked_layers: int):
    """(L,1,…)-shaped 0/1 mask unlocking the LAST `unlocked_layers` layers of a
    stacked (L,…) leaf — matching the torch groups ordering where groups are
    unlocked from the end (transformer.py:448-476)."""
    m = np.zeros((n_layers,), np.float32)
    if unlocked_layers > 0:
        m[n_layers - unlocked_layers:] = 1.0
    shape = (n_layers,) + (1,) * (leaf.ndim - 1)
    return jnp.asarray(m.reshape(shape))


def _is_norm_path(path) -> bool:
    names = [getattr(k, "key", str(k)) for k in path]
    return any(str(n).startswith(("ln_", "norm")) or str(n) == "scale"
               for n in names)


def vision_lock_mask(visual_params: Dict, unlocked_groups: int = 0) -> Any:
    """Mask over a VisionTransformer param subtree.

    Reference groups (transformer.py:448-462), unlocked from the END:
      [stem: conv1, class_embedding, positional_embedding, ln_pre],
      resblocks[0] … resblocks[L-2] (one group each),
      [resblocks[L-1], ln_post], proj.
    unlocked_groups=g unlocks the last g groups.

    Non-ViT towers follow the reference's own semantics:
      * ModifiedResNet.lock (modified_resnet.py:154-159) locks EVERYTHING and
        asserts unlocked_groups == 0;
      * TimmModel.lock (timm_model.py:107-117) locks the TRUNK only — the
        open_clip adapter head (our top-level 'proj' / 'mlp_fc*' params,
        branch-2 towers: convnext/swin/vit_*) stays trainable; EVA towers
        (branch 1) have their projection inside the trunk, so everything
        locks.  Partial unlocking needs timm-master's group_matcher upstream
        (it raises RuntimeError otherwise) — we raise the equivalent.
    """
    if "transformer" not in visual_params:
        if unlocked_groups:
            raise ValueError(
                "lock_image_unlocked_groups > 0 is only supported for the "
                "open_clip ViT tower (reference parity: ModifiedResNet "
                "asserts 0, modified_resnet.py:155; TimmModel requires "
                "timm-master group_matcher, timm_model.py:118-125)")
        _ADAPTER_HEAD = ("proj", "mlp_fc1", "mlp_fc2")

        def mask_nonvit(path, leaf):
            name = str(getattr(path[0], "key", path[0])) if path else ""
            return jnp.asarray(1.0 if name in _ADAPTER_HEAD else 0.0,
                               jnp.float32)

        return jax.tree_util.tree_map_with_path(mask_nonvit, visual_params)

    blocks = visual_params["transformer"]["resblocks"]
    n_layers = int(jax.tree.leaves(blocks)[0].shape[0])
    n_groups = 1 + (n_layers - 1) + 1 + 1  # stem + L-1 blocks + (last+ln_post) + proj
    g = min(int(unlocked_groups), n_groups)
    first_unlocked = n_groups - g  # group index from which params train

    # group index per component
    proj_open = first_unlocked <= n_groups - 1
    last_open = first_unlocked <= n_groups - 2
    stem_open = first_unlocked == 0
    # resblocks[i] (i < L-1) lives in group 1+i → open iff 1+i >= first_unlocked
    n_open_mid = max(0, (n_layers - 1) - max(first_unlocked - 1, 0))
    unlocked_layers = n_open_mid + (1 if last_open else 0)

    def mask_leaf(path, leaf):
        name = str(getattr(path[0], "key", path[0])) if path else ""
        if name in ("conv1", "class_embedding", "positional_embedding", "ln_pre"):
            return jnp.asarray(1.0 if stem_open else 0.0, jnp.float32)
        if name == "ln_post":
            return jnp.asarray(1.0 if last_open else 0.0, jnp.float32)
        if name == "proj":
            return jnp.asarray(1.0 if proj_open else 0.0, jnp.float32)
        if name == "transformer":  # stacked resblock leaf
            return _layer_axis_mask(leaf, n_layers, unlocked_layers)
        if name == "attn_pool":
            return jnp.asarray(1.0 if proj_open else 0.0, jnp.float32)
        return jnp.asarray(0.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(mask_leaf, visual_params)


def text_lock_mask(text_params: Dict, unlocked_layers: int = 0,
                   freeze_layer_norm: bool = True) -> Any:
    """Mask over a TextTransformer param subtree.

    The reference's CLIP.lock_text_tower (model.py:219-225) ignores its
    unlocked_layers/freeze_layer_norm arguments and locks the ENTIRE text
    stack — the defaults here reproduce that.  Nonzero unlocked_layers /
    freeze_layer_norm=False implement the documented open_clip semantics
    (hf_model.py:157-186) as an extension: the last `unlocked_layers` blocks
    plus ln_final/text_projection train, and/or all LayerNorms stay live."""
    blocks = text_params["transformer"]["resblocks"]
    n_layers = int(jax.tree.leaves(blocks)[0].shape[0])
    k = min(int(unlocked_layers), n_layers)

    def mask_leaf(path, leaf):
        name = str(getattr(path[0], "key", path[0])) if path else ""
        if not freeze_layer_norm and _is_norm_path(path):
            if name == "transformer":
                return jnp.ones((1,) * leaf.ndim, jnp.float32)
            return jnp.asarray(1.0, jnp.float32)
        if name == "transformer":
            return _layer_axis_mask(leaf, n_layers, k)
        if name in ("ln_final",):
            # final LN + projection train with the last block (reference keeps
            # them outside the locked set only when any layer is unlocked)
            return jnp.asarray(1.0 if k > 0 else 0.0, jnp.float32)
        if name == "text_projection":
            return jnp.asarray(1.0 if k > 0 else 0.0, jnp.float32)
        return jnp.asarray(0.0, jnp.float32)

    return jax.tree_util.tree_map_with_path(mask_leaf, text_params)


def build_update_mask(trainable_params: Dict,
                      lock_image: bool = False,
                      lock_image_unlocked_groups: int = 0,
                      lock_text: bool = False,
                      lock_text_unlocked_layers: int = 0,
                      lock_text_freeze_layer_norm: bool = True) -> Any:
    """Full update mask over the trainable param dict ('visual'/'text'/rest).
    Leaves are float 0/1 arrays broadcastable to the param shapes; None is
    returned when nothing is locked (main.py:261-269 dispatch)."""
    if not lock_image and not lock_text:
        return None
    mask = {}
    for key, sub in trainable_params.items():
        if key == "visual" and lock_image:
            mask[key] = vision_lock_mask(sub, lock_image_unlocked_groups)
        elif key == "text" and lock_text:
            mask[key] = text_lock_mask(sub, lock_text_unlocked_layers,
                                       lock_text_freeze_layer_norm)
        else:
            mask[key] = jax.tree.map(
                lambda p: jnp.asarray(1.0, jnp.float32), sub)
    return mask


def apply_update_mask(updates, mask):
    if mask is None:
        return updates
    return jax.tree.map(lambda u, m: u * m.astype(u.dtype), updates, mask)
