"""Flax EVA / EVA-02 vision towers — native TPU replacements for the timm
`eva_*` / `eva02_*` backbones the reference wraps via open_clip's timm adapter
(reference: da-clip/src/open_clip/timm_model.py:28-105).

The vendored EVA model configs (assets/model_configs/EVA0*.json) all request
`timm_pool: "token"` with `timm_proj: null`: in the reference adapter that is
the *first* branch (timm_model.py:58-67) — the trunk itself is created with
`num_classes=embed_dim, global_pool="token"`, i.e. the trunk's classifier head
(a Linear from trunk width to the CLIP embed_dim on the cls token) IS the
projection, and the adapter head is empty.  This module reproduces exactly
that: trunk blocks → final LayerNorm → cls token → head Linear(width, embed).

Architecture per variant (EVA: Fang et al. 2022; EVA-02: Fang et al. 2023;
layer semantics follow timm's `eva.py` model definitions, which the reference
depends on — timm itself is torch-only and not part of this image, so parity
tests pin the implementation against a hand-written torch-functional oracle,
tests/parity/test_eva_parity.py):

  * eva_giant_patch14_224  (EVA-01 g/14): plain pre-norm ViT blocks with the
    BEiT-style fused qkv (no k bias: qkv weight is a single (3D, D) Linear
    with learnable q/v biases and a constant-zero k bias), erf-GELU MLP
    (hidden 6144), abs pos embed, no rope.
  * eva02_{base,large}_patch{16,14}_clip_*: EVA-02 CLIP blocks — separate
    q/k/v projections (k without bias), 2-D axial rotary embedding on the
    patch tokens (cls excluded), inner attention LayerNorm over the
    concatenated heads before the output projection ("scale_attn_inner" —
    the EVA-CLIP-specific extra LN), SwiGLU MLP with a LayerNorm before its
    down-projection ("scale_mlp" sub-LN), abs pos embed on top of rope.
  * eva02_enormous_patch14_clip_224: post-norm blocks (residual adds the
    LayerNorm OF the sublayer output), fused qkv, plain erf-GELU MLP
    (hidden 15360), no rope.

All blocks in a trunk are identical, so the stack is a single `nn.scan` over
stacked parameters (one compiled block body — same TPU-first choice as
models/transformer.py).  Rotary tables are position-only constants computed
in numpy at trace time (timm `RotaryEmbeddingCat` semantics: per-axis
frequency bands 1/10000^(i/nb) with nb = head_dim/4, integer coordinates
scaled to `ref_feat_shape`, sin/cos interleave-repeated to head_dim).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from daclip_tpu.models.layers import LayerNorm

Dtype = Any

# timm model-def table for the vendored EVA configs: (patch, width, depth,
# heads, mlp_hidden, swiglu, scale_mlp+scale_attn_inner ("clip extras"),
# rope, post_norm, fused_qkv, ref_feat_shape).  Hidden sizes follow timm's
# int(width * mlp_ratio): 1408·(6144/1408)=6144, 768·(8/3)=2048,
# 1024·(8/3)=2730 (truncated — the EVA-02 paper's published 2730), 15360.
EVA_VARIANTS = {
    "eva_giant_patch14_224": dict(
        patch=14, width=1408, depth=40, heads=16, hidden=6144,
        swiglu=False, clip_extras=False, rope=False, post_norm=False,
        fused_qkv=True, ref_feat=None),
    "eva02_base_patch16_clip_224": dict(
        patch=16, width=768, depth=12, heads=12, hidden=2048,
        swiglu=True, clip_extras=True, rope=True, post_norm=False,
        fused_qkv=False, ref_feat=(16, 16)),
    "eva02_large_patch14_clip_224": dict(
        patch=14, width=1024, depth=24, heads=16, hidden=2730,
        swiglu=True, clip_extras=True, rope=True, post_norm=False,
        fused_qkv=False, ref_feat=(16, 16)),
    "eva02_large_patch14_clip_336": dict(
        patch=14, width=1024, depth=24, heads=16, hidden=2730,
        swiglu=True, clip_extras=True, rope=True, post_norm=False,
        fused_qkv=False, ref_feat=(16, 16)),
    "eva02_enormous_patch14_clip_224": dict(
        patch=14, width=1792, depth=64, heads=16, hidden=15360,
        swiglu=False, clip_extras=False, rope=False, post_norm=True,
        fused_qkv=True, ref_feat=None),
}


def rope_tables(grid_hw: Tuple[int, int], head_dim: int,
                ref_feat: Optional[Tuple[int, int]] = None,
                temperature: float = 10000.0):
    """2-D axial rotary sin/cos tables, (N_patches, head_dim) each.

    timm RotaryEmbeddingCat semantics (in_pixels=False): per axis,
    nb = head_dim//4 frequency bands 1/T^(i/nb) over integer coordinates
    (rescaled by ref_feat/feat when a reference grid is given, so a 336-px
    model reuses the 224-px frequency geometry); sin/cos of the two axes are
    concatenated then each value repeated ×2 to cover interleaved (even,odd)
    rotation pairs."""
    nb = head_dim // 4
    bands = 1.0 / (temperature ** (np.arange(nb, dtype=np.float64) / nb))
    ts = []
    for i, s in enumerate(grid_hw):
        t = np.arange(s, dtype=np.float64)
        if ref_feat is not None:
            t = t / s * ref_feat[i]
        ts.append(t)
    gh, gw = np.meshgrid(ts[0], ts[1], indexing="ij")
    pos = np.stack([gh, gw], axis=-1)[..., None] * bands      # (H, W, 2, nb)
    pos = pos.reshape(-1, 2 * nb)                              # (N, 2·nb)
    sin = np.repeat(np.sin(pos), 2, axis=-1).astype(np.float32)
    cos = np.repeat(np.cos(pos), 2, axis=-1).astype(np.float32)
    return sin, cos


def apply_rope(x, sin, cos):
    """x·cos + rot(x)·sin with interleaved pairs — x: (B, N, H, hd),
    sin/cos: (N, hd) (timm `apply_rot_embed_cat`)."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    rot = jnp.stack([-x2, x1], axis=-1).reshape(x.shape)
    sin = sin[None, :, None, :].astype(x.dtype)
    cos = cos[None, :, None, :].astype(x.dtype)
    return x * cos + rot * sin


class EvaAttention(nn.Module):
    """EVA attention: BEiT-style fused qkv (no k bias) or separate q/k/v
    projections (k without bias), rope on patch tokens, optional inner LN
    over the concatenated heads before the output projection."""
    width: int
    heads: int
    fused_qkv: bool = True
    inner_norm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rope: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        B, N, D = x.shape
        H, hd = self.heads, D // self.heads
        if self.fused_qkv:
            qkv = nn.Dense(3 * D, use_bias=False, dtype=self.dtype,
                           param_dtype=jnp.float32, name="qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q_bias = self.param("q_bias", nn.initializers.zeros, (D,), jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (D,), jnp.float32)
            q = q + q_bias.astype(q.dtype)   # k keeps a constant zero bias
            v = v + v_bias.astype(v.dtype)
        else:
            q = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                         name="q_proj")(x)
            k = nn.Dense(D, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="k_proj")(x)
            v = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                         name="v_proj")(x)
        q = q.reshape(B, N, H, hd)
        k = k.reshape(B, N, H, hd)
        v = v.reshape(B, N, H, hd)
        if rope is not None:
            sin, cos = rope
            # cls token (position 0) is excluded from rotation
            q = jnp.concatenate([q[:, :1], apply_rope(q[:, 1:], sin, cos)], axis=1)
            k = jnp.concatenate([k[:, :1], apply_rope(k[:, 1:], sin, cos)], axis=1)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits * (hd ** -0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, D)
        if self.inner_norm:
            out = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm")(out)
        return nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class EvaBlock(nn.Module):
    """One EVA block, scan-compatible: (x, rope) -> (x, None)."""
    width: int
    heads: int
    hidden: int
    swiglu: bool = False
    clip_extras: bool = False   # scale_attn_inner + scale_mlp (EVA-CLIP LNs)
    post_norm: bool = False
    fused_qkv: bool = True
    dtype: Dtype = jnp.float32

    def _mlp(self, x):
        if self.swiglu:
            g = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                         name="mlp_fc1_g")(x)
            h = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                         name="mlp_fc1_x")(x)
            x = nn.silu(g) * h
        else:
            x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                         name="mlp_fc1")(x)
            x = nn.gelu(x, approximate=False)
        if self.clip_extras:      # sub-LN before the down-projection
            x = LayerNorm(eps=1e-6, dtype=self.dtype, name="mlp_norm")(x)
        return nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                        name="mlp_fc2")(x)

    @nn.compact
    def __call__(self, x, rope):
        attn = EvaAttention(self.width, self.heads, fused_qkv=self.fused_qkv,
                            inner_norm=self.clip_extras, dtype=self.dtype,
                            name="attn")
        n1 = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm1")
        n2 = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm2")
        if self.post_norm:        # EvaBlockPostNorm: norm OF the sublayer out
            x = x + n1(attn(x, rope))
            x = x + n2(self._mlp(x))
        else:
            x = x + attn(n1(x), rope)
            x = x + self._mlp(n2(x))
        return x, None


class EvaTower(nn.Module):
    """Full EVA trunk in adapter branch-1 form (timm_model.py:58-67):
    patch embed → cls + abs pos embed → scanned blocks → LayerNorm →
    cls token → head Linear(width, embed_dim).  Output IS the CLIP image
    embedding (no separate adapter projection)."""
    model_name: str
    embed_dim: int
    image_size: int = 224
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, control=None, output_hiddens: bool = False,
                 train: bool = False):
        assert control is None and not output_hiddens, (
            "EVA towers have no controller wiring; the DA-CLIP controller "
            "requires the open_clip ViT vision tower")
        cfg = EVA_VARIANTS[self.model_name]
        p, D = cfg["patch"], cfg["width"]
        B, H, W, C = x.shape
        gh, gw = H // p, W // p
        # patch embed as a matmul (pixel-major (p·p·C, D) kernel — same
        # layout as VisionTransformer.conv1, torch_convert.py:100-107)
        patches = x.reshape(B, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(B, gh * gw, p * p * C)
        kernel = self.param("patch_embed", nn.initializers.lecun_normal(),
                            (p * p * C, D), jnp.float32)
        pbias = self.param("patch_bias", nn.initializers.zeros, (D,), jnp.float32)
        x = patches @ kernel.astype(self.dtype) + pbias.astype(self.dtype)
        cls = self.param("cls_token", nn.initializers.zeros, (D,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, D)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (gh * gw + 1, D), jnp.float32)
        x = x + pos.astype(x.dtype)

        rope = None
        if cfg["rope"]:
            sin, cos = rope_tables((gh, gw), D // cfg["heads"],
                                   ref_feat=cfg["ref_feat"])
            rope = (jnp.asarray(sin), jnp.asarray(cos))

        block_cls = EvaBlock
        if self.remat:
            block_cls = nn.remat(block_cls, prevent_cse=False)
        x, _ = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            out_axes=0,
            length=cfg["depth"],
        )(width=D, heads=cfg["heads"], hidden=cfg["hidden"],
          swiglu=cfg["swiglu"], clip_extras=cfg["clip_extras"],
          post_norm=cfg["post_norm"], fused_qkv=cfg["fused_qkv"],
          dtype=self.dtype, name="blocks")(x, rope)

        x = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm")(x)
        x = x[:, 0]   # global_pool='token'
        return nn.Dense(self.embed_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="head")(x)
