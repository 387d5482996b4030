"""ModifiedResNet vision tower — the OpenAI CLIP ResNet (RN50 family), NHWC flax.

Reference: universal-image-restoration/open_clip/modified_resnet.py:10-181
(3-conv stem + avgpool, anti-aliased strided Bottlenecks — avgpool before
stride-1 convs — and an AttentionPool2d head instead of average pooling).

BatchNorm runs in inference mode with converted running statistics (the DA-CLIP
pipelines only ever use ResNet towers frozen/pretrained); training-mode BN for
from-scratch RN training is out of the DA-CLIP path.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """Inference-mode BN: y = (x - mean)·scale/sqrt(var+eps) + bias with
    converted running stats stored as params."""
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (C,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (C,), jnp.float32)
        w = (scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        b = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        return x * w + b


def _conv(features, k, stride=1, name=None, dtype=jnp.float32):
    return nn.Conv(features, (k, k), strides=stride, padding=k // 2,
                   use_bias=False, dtype=dtype, param_dtype=jnp.float32,
                   name=name)


def _avgpool(x, k):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class Bottleneck(nn.Module):
    """modified_resnet.py:10-56."""
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(
            _conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)))
        out = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(
            _conv(self.planes, 3, name="conv2", dtype=self.dtype)(out)))
        if self.stride > 1:
            out = _avgpool(out, self.stride)
        out = FrozenBatchNorm(dtype=self.dtype, name="bn3")(
            _conv(self.planes * self.expansion, 1, name="conv3",
                  dtype=self.dtype)(out))
        identity = x
        if self.stride > 1 or inplanes != self.planes * self.expansion:
            identity = x if self.stride == 1 else _avgpool(x, self.stride)
            identity = _conv(self.planes * self.expansion, 1, name="down_conv",
                             dtype=self.dtype)(identity)
            identity = FrozenBatchNorm(dtype=self.dtype, name="down_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """modified_resnet.py:59-95: mean-prepended QKV attention pooling."""
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        n = H * W
        tokens = x.reshape(B, n, C)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], 1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(C ** -0.5), (n + 1, C),
                         jnp.float32)
        tokens = tokens + pos.astype(tokens.dtype)
        q = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="q_proj")(tokens[:, :1])
        k = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="k_proj")(tokens)
        v = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="v_proj")(tokens)
        hd = C // self.num_heads
        q = q.reshape(B, 1, self.num_heads, hd)
        k = k.reshape(B, n + 1, self.num_heads, hd)
        v = v.reshape(B, n + 1, self.num_heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(logits * (hd ** -0.5), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, C)
        return nn.Dense(self.output_dim, dtype=self.dtype,
                        param_dtype=jnp.float32, name="c_proj")(out)


class ModifiedResNet(nn.Module):
    """modified_resnet.py:97-181; NHWC input."""
    layers: Sequence[int] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    image_size: int = 224
    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, control=None, output_hiddens: bool = False):
        if control is not None or output_hiddens:
            # the DA-CLIP controller is transformer-only in the reference too
            # (ControlTransformer wraps Transformer, transformer.py:288-325);
            # failing loudly beats silently dropping the control injection
            raise NotImplementedError(
                "ModifiedResNet does not support the DA-CLIP controller "
                "(control/output_hiddens); use a ViT vision tower")
        w = self.width
        for i, (feat, stride) in enumerate([(w // 2, 2), (w // 2, 1), (w, 1)]):
            x = _conv(feat, 3, stride, name=f"stem_conv{i + 1}",
                      dtype=self.dtype)(x)
            x = FrozenBatchNorm(dtype=self.dtype, name=f"stem_bn{i + 1}")(x)
            x = nn.relu(x)
        x = _avgpool(x, 2)

        inplanes = w
        for li, (planes, blocks, stride) in enumerate(
                [(w, self.layers[0], 1), (w * 2, self.layers[1], 2),
                 (w * 4, self.layers[2], 2), (w * 8, self.layers[3], 2)]):
            for bi in range(blocks):
                x = Bottleneck(planes, stride if bi == 0 else 1,
                               dtype=self.dtype,
                               name=f"layer{li + 1}_{bi}")(x)
        return AttentionPool2d(self.heads, self.output_dim, dtype=self.dtype,
                               name="attnpool")(x)
