"""Shared flax building blocks for the CLIP/DaCLIP towers.

TPU-native conventions used throughout the model library:
  * params live in float32 (`param_dtype`), activations in `dtype` (bf16 on TPU),
  * LayerNorm always accumulates in float32 and casts back — the equivalent of the
    reference's `LayerNormFp32` (open_clip/transformer.py:13-19),
  * attention logits/softmax in float32 via `preferred_element_type`,
  * token layout is (batch, seq, dim); the reference permutes to (seq, batch, dim)
    for torch's nn.MultiheadAttention, which is irrelevant here.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class LayerNorm(nn.Module):
    """Affine LayerNorm with f32 accumulation (open_clip/transformer.py:13-28)."""
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(orig_dtype)


def quick_gelu(x):
    """x·σ(1.702x) — OpenAI CLIP activation (open_clip/transformer.py:31-34)."""
    return x * jax.nn.sigmoid(1.702 * x)


def get_act(quick: bool) -> Callable:
    # exact (erf) GELU to match torch nn.GELU; jax's default is the tanh approximation
    return quick_gelu if quick else (lambda x: nn.gelu(x, approximate=False))


class MultiheadAttention(nn.Module):
    """Packed-QKV softmax attention matching torch nn.MultiheadAttention semantics
    (used by ResidualAttentionBlock, open_clip/transformer.py:189-244)."""
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        B, N, D = x.shape
        H = self.heads
        hd = D // H
        qkv = nn.Dense(3 * D, dtype=self.dtype, param_dtype=jnp.float32,
                       name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, H, hd)
        k = k.reshape(B, N, H, hd)
        v = v.reshape(B, N, H, hd)
        # NOTE: no preferred_element_type here — on TPU, forcing an f32 output
        # from bf16 matmul inputs selects a several-x slower path; the MXU
        # accumulates in f32 internally either way.  Softmax runs in f32.
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits * (hd ** -0.5)
        if mask is not None:
            logits = logits + mask.astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                        name="out_proj")(out)


class ScaledCosineAttention(nn.Module):
    """open_clip's custom `Attention` (transformer.py:87-160): optional
    scaled-cosine logits (Swin-v2 style — L2-normalised q/k with a learned
    per-head temperature clamped at `logit_scale_max`) and optional per-head
    output scaling.  Not used by any shipped model config (only
    CustomResidualAttentionBlock consumes it upstream) but part of the
    SURVEY §2.1 surface; parity-tested against the torch module."""
    width: int
    heads: int
    scaled_cosine: bool = True
    scale_heads: bool = False
    logit_scale_max: float = 4.6051701859880914  # math.log(1/0.01)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        B, N, D = x.shape
        H = self.heads
        hd = D // H
        qkv = nn.Dense(3 * D, dtype=self.dtype, param_dtype=jnp.float32,
                       name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, H, hd)
        k = k.reshape(B, N, H, hd)
        v = v.reshape(B, N, H, hd)
        if self.scaled_cosine:
            logit_scale = self.param(
                "logit_scale",
                lambda _: jnp.full((H, 1, 1), jnp.log(10.0), jnp.float32))
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            qf = qf / jnp.maximum(jnp.linalg.norm(qf, axis=-1, keepdims=True),
                                  1e-12)
            kf = kf / jnp.maximum(jnp.linalg.norm(kf, axis=-1, keepdims=True),
                                  1e-12)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qf, kf)
            scale = jnp.exp(jnp.minimum(logit_scale, self.logit_scale_max))
            logits = logits * scale[None]
        else:
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            logits = logits * (hd ** -0.5)
        if mask is not None:
            logits = logits + mask.astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        if self.scale_heads:
            head_scale = self.param("head_scale", nn.initializers.ones,
                                    (H, 1, 1), jnp.float32)
            # per-head scalar scaling (reference broadcasts (H,1,1) over the
            # head-major view)
            out = out * head_scale.reshape(1, 1, H, 1).astype(out.dtype)
        out = out.reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                        name="out_proj")(out)


class CrossMultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention with distinct query and key/value sources
    (and optionally kdim != embed_dim — separate q/k/v projections, the layout
    torch uses whenever kdim/vdim differ).  Used by the CoCa decoder's
    cross-attention blocks (transformer.py:710-721) and AttentionalPooler
    (transformer.py:163-186)."""
    width: int
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q_x, kv_x, mask: Optional[jnp.ndarray] = None):
        B, Nq, _ = q_x.shape
        Nk = kv_x.shape[1]
        H = self.heads
        hd = self.width // H
        q = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="q_proj")(q_x).reshape(B, Nq, H, hd)
        k = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="k_proj")(kv_x).reshape(B, Nk, H, hd)
        v = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="v_proj")(kv_x).reshape(B, Nk, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        logits = logits * (hd ** -0.5)
        if mask is not None:
            logits = logits + mask.astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, Nq, self.width)
        return nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                        name="out_proj")(out)


class MLP(nn.Module):
    """c_fc → act → c_proj (open_clip/transformer.py:208-214)."""
    width: int
    mlp_width: int
    quick_gelu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.mlp_width, dtype=self.dtype, param_dtype=jnp.float32,
                     name="c_fc")(x)
        x = get_act(self.quick_gelu)(x)
        return nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                        name="c_proj")(x)
