"""Flax Swin-Transformer vision tower — native TPU replacement for timm's
`swin_base_patch4_window7_224` that the vendored
assets/model_configs/swin_base_patch4_window7_224.json requests through
open_clip's timm adapter (da-clip/src/open_clip/timm_model.py:68-105 —
`timm_pool: ""`, `timm_proj: "linear"`: trunk with classifier reset keeping
the network-default global average pool, then a bias-free Linear to
embed_dim).

Architecture (Liu et al. 2021, Swin-v1, matching the timm/Microsoft model
def): patch-embed 4×4/4 conv + LN → 4 stages of windowed-attention blocks
(depths 2/2/18/2, heads 4/8/16/32, window 7, mlp ratio 4, qkv bias, learned
relative-position bias table per block), alternating blocks shift the window
grid by w//2 with the boundary-region attention mask, PatchMerging
(2×2 concat → LN(4C) → Linear(4C→2C, no bias)) between stages → final LN →
token-mean pool.  LayerNorm eps is the torch default 1e-5 (Swin does not
override it).

TPU notes: the feature map stays NHWC end-to-end; window partition/merge are
pure reshape/transpose (no data-dependent control flow), cyclic shifts are
`jnp.roll`, and the shifted-window attention mask per stage is a trace-time
numpy constant — everything under jit is static-shaped.  timm is torch-only
and absent from this image; parity is pinned against a hand-written
torch-functional oracle (tests/parity/test_swin_parity.py), same policy as
models/convnext.py.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from daclip_tpu.models.layers import LayerNorm

Dtype = Any

SWIN_VARIANTS = {
    "swin_base_patch4_window7_224": dict(
        patch=4, embed=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32),
        window=7, mlp_ratio=4.0),
}


def _rel_index(w: int) -> np.ndarray:
    """Relative-position index for one w×w window: flat (w²·w²,) indices into
    the (2w-1)² bias table (Swin construction)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel += w - 1
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).reshape(-1)


def _shift_mask(grid: int, w: int, shift: int) -> np.ndarray:
    """Additive attention mask (nW, w², w²) for shifted windows: 0 within the
    same pre-shift region, -100 across regions (timm/Microsoft constant)."""
    img = np.zeros((grid, grid), dtype=np.int32)
    cnt = 0
    bounds = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    for hs in bounds:
        for ws in bounds:
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(grid // w, w, grid // w, w).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, w * w)                       # (nW, w²)
    diff = wins[:, :, None] != wins[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    """w×w windowed MHSA with learned relative-position bias."""
    dim: int
    heads: int
    window: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        # x: (nB, w², C); mask: (nW, w², w²) or None — nB = B·nW
        nB, N, C = x.shape
        H, hd = self.heads, self.dim // self.heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(nB, N, H, hd)
        k = k.reshape(nB, N, H, hd)
        v = v.reshape(nB, N, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits * (hd ** -0.5)
        table = self.param("rel_pos_table", nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, H), jnp.float32)
        idx = jnp.asarray(_rel_index(self.window))
        bias = table[idx].reshape(N, N, H).transpose(2, 0, 1)
        logits = logits + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            logits = logits.reshape(nB // nW, nW, H, N, N)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(nB, H, N, N)
        a = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(nB, N, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, G, G, C)
        B, G, _, C = x.shape
        w, s = self.window, self.shift
        shortcut = x
        x = LayerNorm(dtype=self.dtype, name="norm1")(x)
        if s:
            x = jnp.roll(x, (-s, -s), axis=(1, 2))
        wins = x.reshape(B, G // w, w, G // w, w, C).transpose(0, 1, 3, 2, 4, 5)
        wins = wins.reshape(-1, w * w, C)
        mask = jnp.asarray(_shift_mask(G, w, s)) if s else None
        wins = WindowAttention(self.dim, self.heads, w, dtype=self.dtype,
                               name="attn")(wins, mask)
        x = wins.reshape(B, G // w, G // w, w, w, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, G, G, C)
        if s:
            x = jnp.roll(x, (s, s), axis=(1, 2))
        x = shortcut + x
        y = LayerNorm(dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc2")(y)
        return x + y


class SwinTower(nn.Module):
    """Trunk (classifier reset, avg pool) + adapter projection."""
    model_name: str
    embed_dim: int
    image_size: int = 224
    proj: str = "linear"
    drop: float = 0.0
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, control=None, output_hiddens: bool = False,
                 train: bool = False):
        assert control is None and not output_hiddens, (
            "Swin towers have no transformer hiddens; the DA-CLIP controller "
            "requires the open_clip ViT vision tower")
        cfg = SWIN_VARIANTS[self.model_name]
        p, w = cfg["patch"], cfg["window"]
        n_merges = len(cfg["depths"]) - 1
        need = p * (2 ** n_merges)
        if (x.shape[1] % need or x.shape[2] % need
                or (x.shape[1] // need) % w or (x.shape[2] // need) % w):
            raise ValueError(
                f"swin geometry: input {x.shape[1]}x{x.shape[2]} must be a "
                f"multiple of patch*2^merges*window = {need * w} (grid halves "
                f"{n_merges}x and each stage partitions into {w}x{w} windows); "
                f"{self.model_name} is defined at {self.image_size}px")
        x = nn.Conv(cfg["embed"], (p, p), strides=(p, p), dtype=self.dtype,
                    name="patch_embed")(x)
        x = LayerNorm(dtype=self.dtype, name="patch_norm")(x)
        for si, (depth, heads) in enumerate(zip(cfg["depths"], cfg["heads"])):
            dim = cfg["embed"] * (2 ** si)
            if si > 0:
                # PatchMerging: 2×2 spatial concat (x0,x1,x2,x3 row-major in
                # (h,w) parity order) → LN(4C) → Linear(4C→2C, no bias)
                B, G, _, C = x.shape
                x = x.reshape(B, G // 2, 2, G // 2, 2, C)
                x = x.transpose(0, 1, 3, 4, 2, 5)   # (B,G/2,G/2, wp, hp, C)
                # torch order concat([x0,x1,x2,x3]) = [(h0,w0),(h1,w0),(h0,w1),(h1,w1)]
                x = x.reshape(B, G // 2, G // 2, 4 * C)
                x = LayerNorm(dtype=self.dtype, name=f"merge_norm{si}")(x)
                x = nn.Dense(dim, use_bias=False, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"merge_proj{si}")(x)
            G = x.shape[1]
            block_cls = (nn.remat(SwinBlock, prevent_cse=False)
                         if self.remat else SwinBlock)
            for bj in range(depth):
                shift = 0 if (bj % 2 == 0 or G <= w) else w // 2
                x = block_cls(dim, heads, w, shift, cfg["mlp_ratio"],
                              dtype=self.dtype,
                              name=f"stage{si}_block{bj}")(x)
        B, G, _, C = x.shape
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x.reshape(B, G * G, C), axis=1)    # global avg pool
        if self.proj == "linear":
            if train and self.drop > 0.0 and self.has_rng("dropout"):
                x = nn.Dropout(self.drop, deterministic=False)(x)
            x = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="proj")(x)
        elif self.proj:
            raise ValueError(f"unknown projection type {self.proj!r}")
        return x
