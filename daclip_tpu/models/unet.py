"""ConditionalUNet — the IR-SDE noise/score network, NHWC flax re-design.

Reference: universal-image-restoration/config/daclip-sde/models/modules/
  DenoisingUNet_arch.py:21-174 (+ the wild-ir variant with `scale=0.5`,
  config/wild-ir/models/modules/DenoisingUNet_arch.py:37-40,136-140,176-180),
  module_util.py (ResBlock/LinearAttention/blocks), attention.py (SpatialTransformer).

TPU-native choices:
  * NHWC layout (XLA's native conv layout on TPU), params f32, compute `dtype`
    (bf16 on TPU) with f32 normalisation statistics,
  * single-token image-context cross-attention short-circuits the softmax
    (softmax over one key is 1 → out = to_out(v)); mathematically identical,
  * static shapes: callers pad/bucket image sizes; reflect-pad to a multiple of
    2^depth is applied here exactly like the reference (:111-116).
Weight-compat: module names map 1:1 onto the reference state_dict via
utils/torch_convert.py.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from daclip_tpu import flags

Dtype = Any


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """module_util.py:36-48."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class ChannelLayerNorm(nn.Module):
    """Bias-free channel LayerNorm, biased variance (module_util.py:77-86)."""
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * g
        return y.astype(x.dtype)


def _channel_ln(x, g, dtype, eps: float = 1e-5):
    """Functional ChannelLayerNorm with an externally-owned gain (used when
    the wrapper's prenorm param is applied inside LinearAttention)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)
    return y.astype(x.dtype)


class Conv1x1(nn.Module):
    """1x1 conv evaluated as a matmul over flattened pixels — ~2.6x faster than
    the TPU conv emitter for pointwise convs (measured on v5e); params keep the
    (1,1,I,O) conv-kernel shape for checkpoint compatibility."""
    features: int
    use_bias: bool = False
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        kernel = self.param("kernel", self.kernel_init,
                            (1, 1, C, self.features), jnp.float32)
        w = kernel.reshape(C, self.features).astype(self.dtype)
        y = jnp.dot(x.reshape(-1, C), w).reshape(B, H, W, self.features)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


def conv(features: int, kernel: int, use_bias: bool = False, strides: int = 1,
         padding=None, dtype=jnp.float32, name: Optional[str] = None):
    """default_conv (module_util.py:111-112): k//2 zero padding, bias off."""
    if kernel == 1 and strides == 1 and (padding is None or padding == 0):
        return Conv1x1(features, use_bias=use_bias, dtype=dtype, name=name)
    if padding is None:
        padding = kernel // 2
    return nn.Conv(features, (kernel, kernel), strides=strides,
                   padding=padding, use_bias=use_bias, dtype=dtype,
                   param_dtype=jnp.float32, name=name)


class Block(nn.Module):
    """conv3x3 (no bias) → optional (scale+1)·x+shift → SiLU (module_util.py:115-129).

    `skip` evaluates conv(concat(x, skip)) WITHOUT materializing the concat:
    the kernel is sliced along its input-channel axis and applied as two convs
    summed — algebraically identical, but the (B,H,W,Cx+Cs) concat copy never
    hits HBM (the skip-connection concats showed up as multi-ms `copy` ops in
    the profiler trace at the production config)."""
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scale_shift: Optional[Tuple] = None, skip=None):
        if skip is None:
            x = conv(self.dim_out, 3, dtype=self.dtype, name="proj")(x)
        else:
            m = nn.Conv(self.dim_out, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32, name="proj")
            Cx = x.shape[-1]
            _ = m(jnp.zeros((1, 3, 3, Cx + skip.shape[-1]), x.dtype))
            k = m.variables["params"]["kernel"].astype(self.dtype)
            dn = ("NHWC", "HWIO", "NHWC")
            pad = [(1, 1), (1, 1)]
            x = (jax.lax.conv_general_dilated(x, k[:, :, :Cx], (1, 1), pad,
                                              dimension_numbers=dn)
                 + jax.lax.conv_general_dilated(skip, k[:, :, Cx:], (1, 1),
                                                pad, dimension_numbers=dn))
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0) + shift
        return nn.silu(x)


class ResBlock(nn.Module):
    """module_util.py:132-153: time-conditioned double conv + skip.

    `skip` is the UNet skip-connection tensor: logically the block input is
    concat(x, skip) (DenoisingUNet_arch.py:98-100 `torch.cat`), evaluated
    concat-free via split kernels in block1/res_conv (see Block)."""
    dim_out: int
    time_emb: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_emb: Optional[jnp.ndarray] = None, skip=None):
        scale_shift = None
        if self.time_emb and time_emb is not None:
            h = nn.silu(time_emb)
            h = nn.Dense(self.dim_out * 2, dtype=self.dtype,
                         param_dtype=jnp.float32, name="mlp")(h)
            h = h[:, None, None, :]
            scale_shift = jnp.split(h, 2, axis=-1)

        in_ch = x.shape[-1] + (0 if skip is None else skip.shape[-1])
        need_res = in_ch != self.dim_out
        # Merged block1+res_conv: when the residual needs a 1×1 projection and
        # dim_out ≤ 64 (half the 128-wide MXU), evaluate block1's 3×3 conv and
        # res_conv as ONE conv with 2·dim_out output channels (the 1×1 kernel
        # embedded as the center tap of a 3×3).  Exactly the same math, but
        #   * the res_conv dot — which XLA emits through an 11 TF/s sublane
        #     conv path on the NHWC operand (3.07 ms each at 256², profiled)
        #     — disappears into the conv, and
        #   * the conv's MXU output-lane utilization doubles (N 64→128),
        # so the merged conv costs what block1 alone used to.  At dim_out ≥
        # 128 the conv is already full-width and the center-tap zeros would
        # add 80% real FLOPs — keep the separate dot there.
        merge = (need_res and skip is None  # concat path (default wiring)
                 and 2 * self.dim_out <= 128 and flags.MERGE_RES)
        if merge:
            blk = Block(self.dim_out, dtype=self.dtype, name="block1")
            _ = blk(jnp.zeros((1, 3, 3, in_ch), x.dtype))
            rc = Conv1x1Pair(self.dim_out, dtype=self.dtype, name="res_conv")
            _ = rc(jnp.zeros((1, 1, 1, in_ch), x.dtype))
            k3 = blk.variables["params"]["proj"]["kernel"]
            k1 = rc.variables["params"]["kernel"]
            km = jnp.concatenate(
                [k3, jnp.pad(k1, ((1, 1), (1, 1), (0, 0), (0, 0)))],
                axis=-1).astype(self.dtype)
            y = jax.lax.conv_general_dilated(
                x, km, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # Apply block1's (scale+1)·x+shift → SiLU epilogue to the FULL
            # 2·dim_out output in ONE channel-masked elementwise pass (the res
            # half rides through via zero scale/shift), so XLA epilogue-fuses
            # it into the conv — slicing h first demotes it to a standalone
            # 1.6 ms HBM pass (profiled).
            if scale_shift is not None:
                scale, shift = scale_shift
                pad = ((0, 0), (0, 0), (0, 0), (0, self.dim_out))
                w = (y * (jnp.pad(scale.astype(y.dtype), pad) + 1.0)
                     + jnp.pad(shift.astype(y.dtype), pad))
            else:
                w = y
            cmask = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, 1, 2 * self.dim_out), 3) < self.dim_out
            z = jnp.where(cmask, nn.silu(w), w)
            h, res = z[..., :self.dim_out], z[..., self.dim_out:]
        else:
            h = Block(self.dim_out, dtype=self.dtype, name="block1")(
                x, scale_shift, skip=skip)
            if need_res:
                res = Conv1x1Pair(self.dim_out, dtype=self.dtype,
                                  name="res_conv")(x, skip)
            else:
                res = x
        bar = flags.BLOCK_BARRIER
        if bar != "0" and min(h.shape[1], h.shape[2]) >= int(bar):
            # stop XLA input-fusing block1's (scale+1)·x+shift → SiLU epilogue
            # into block2's 3×3 conv: input fusion recomputes the elementwise
            # prologue per overlapping window (up to 9×); one materialized
            # HBM round-trip is cheaper (full-forward chained B32/256² on
            # v5e: 115.7 ms all-levels vs 118.9 without, thresholds 64/128
            # marginally worse — BASELINE.md).  "0" disables; an integer
            # sets the min spatial size to apply ("1" = every level)
            h = jax.lax.optimization_barrier(h)
        h = Block(self.dim_out, dtype=self.dtype, name="block2")(h)
        return h + res


class Conv1x1Pair(nn.Module):
    """Conv1x1 over a logical concat(x, skip) without the concat (kernel kept
    in the (1,1,Cx+Cs,O) checkpoint shape)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        B, H, W, Cx = x.shape
        Cin = Cx + (0 if skip is None else skip.shape[-1])
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, Cin, self.features), jnp.float32)
        w = kernel.reshape(Cin, self.features).astype(self.dtype)
        # XLA lowers this dot on a conv-layout operand through the slow conv
        # sublane emitter (~11 TF/s profiled at 256²/C64); the pallas row-dot
        # (ops/pointwise.py) beats it in isolation but LOSES at full-forward
        # level (131 vs 119 ms) — opt-in only, DACLIP_TPU_POINTWISE=1
        from daclip_tpu.ops.pointwise import dual_conv1x1, pointwise_supported
        if pointwise_supported(x, skip, O=self.features):
            return dual_conv1x1(x.astype(self.dtype),
                                None if skip is None
                                else skip.astype(self.dtype), w)
        y = jnp.dot(x.reshape(-1, Cx), w[:Cx])
        if skip is not None:
            y = y + jnp.dot(skip.reshape(-1, Cin - Cx), w[Cx:])
        return y.reshape(B, H, W, self.features)


class LinearAttention(nn.Module):
    """Channel linear attention (module_util.py:157-185), wrapped by the caller
    in Residual(PreNorm(·)).  hidden = heads·dim_head = 128 for every level.

    __call__(x, context, g_pre) takes the RAW (un-normalized) x when `g_pre`
    (the wrapper's PreNorm gain) is given, and returns (out, fused):
      * fused=True  — out is the COMPLETE Residual(PreNorm(attn)) result,
        computed by one Pallas kernel (ops/linear_attention.py v3),
      * fused=False — out is just the attention branch; the caller applies the
        residual.  (When g_pre is given the prenorm is applied here.)
    """
    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, g_pre=None):
        B, H, W, C = x.shape
        n = H * W
        hidden = self.heads * self.dim_head

        from daclip_tpu.ops.linear_attention import (
            attn_wrap_fused, attn_wrap_fused_v5, linear_attention_fused,
            linear_attention_reference, linear_attention_supported)

        qkv_mod = Conv1x1(hidden * 3, dtype=self.dtype, name="to_qkv")
        out_mod = Conv1x1(C, use_bias=True, dtype=self.dtype, name="to_out")
        norm_mod = ChannelLayerNorm(dtype=self.dtype, name="to_out_norm")

        if (self.dtype == jnp.bfloat16
                and linear_attention_supported(n, hidden)):
            # Fused two-pass Pallas kernel (ops/linear_attention.py).  Dummy
            # calls materialise the child params so the tree is identical to
            # the jnp path; their compute is dead code.
            _ = norm_mod(out_mod(qkv_mod(
                jnp.zeros((1, 1, 1, C), self.dtype))[..., :hidden]))
            w_qkv = qkv_mod.variables["params"]["kernel"].reshape(C, 3 * hidden)
            w_out = out_mod.variables["params"]["kernel"].reshape(hidden, C)
            b_out = out_mod.variables["params"]["bias"]
            g_out = norm_mod.variables["params"]["g"]
            # v5 whole-wrap: prenorm LN + attention + out-proj + LN + residual
            # via the v4 SPLIT kernels (stats → apply), LN inline on the VPU.
            # Unlike the retired v3 two-phase wrap (149.6 ms fwd — redundant
            # phase-0 output writes), v5 keeps single-visit writes and removes
            # the XLA-side LN reduces + residual copy_add (~3.3 ms per L0
            # call, profiled).  DACLIP_TPU_V5_WRAP=0 restores the v4 wiring.
            if g_pre is not None and flags.V5_WRAP:
                out = attn_wrap_fused_v5(
                    x.reshape(B, n, C).astype(self.dtype),
                    g_pre.astype(self.dtype), w_qkv.astype(self.dtype),
                    w_out.astype(self.dtype), b_out.astype(self.dtype),
                    g_out.astype(self.dtype))
                return out.reshape(B, H, W, C).astype(x.dtype), True
            if g_pre is not None and flags.V3_WRAP:
                # v3 two-phase wrap: kept for reference, measured slower
                out = attn_wrap_fused(
                    x.reshape(B, n, C).astype(self.dtype),
                    g_pre.astype(self.dtype), w_qkv.astype(self.dtype),
                    w_out.astype(self.dtype), b_out.astype(self.dtype),
                    g_out.astype(self.dtype))
                return out.reshape(B, H, W, C).astype(x.dtype), True
            xn = x if g_pre is None else _channel_ln(x, g_pre, self.dtype)
            out = linear_attention_fused(
                xn.reshape(B, n, C).astype(self.dtype),
                w_qkv.astype(self.dtype), w_out.astype(self.dtype),
                b_out.astype(self.dtype), g_out.astype(self.dtype))
            return out.reshape(B, H, W, C).astype(x.dtype), False

        xn = x if g_pre is None else _channel_ln(x, g_pre, self.dtype)
        qkv = qkv_mod(xn)
        out = linear_attention_reference(
            qkv.reshape(B, n, 3 * hidden), heads=self.heads,
            dim_head=self.dim_head, dtype=self.dtype)
        out = out.reshape(B, H, W, hidden).astype(x.dtype)
        return norm_mod(out_mod(out)), False


class CrossAttention(nn.Module):
    """attention.py:152-193.  When the context has exactly one token the softmax
    over keys is identically 1, so out = to_out(v) — exact same math, no attention
    matrix materialised (the DA-CLIP image context is a single 512-d embedding,
    DenoisingUNet_arch.py:139-140)."""
    heads: int
    dim_head: int
    query_dim: int
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        B, N, _ = x.shape
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="to_v")(ctx)
        if ctx.shape[1] == 1 and ctx is not x:
            out = jnp.broadcast_to(v, (B, N, inner))
        else:
            from daclip_tpu.ops.flash_attention import (
                flash_attention_supported, flash_self_attention)

            q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         param_dtype=jnp.float32, name="to_q")(x)
            Nk = ctx.shape[1]
            if (self.dtype == jnp.bfloat16 and Nk == N
                    and flash_attention_supported(B, self.heads, N,
                                                  self.dim_head)):
                # Pallas flash path, packed (B, N, H·D) layout: never
                # materializes the (B,H,N,N) f32 attention matrix in HBM and
                # needs no head transposes (ops/flash_attention.py — the three
                # SpatialTransformers were ~22% of the UNet forward)
                out = flash_self_attention(q, k, v, self.heads, self.dim_head)
            else:
                q = q.reshape(B, N, self.heads, self.dim_head)
                k = k.reshape(B, -1, self.heads, self.dim_head)
                v = v.reshape(B, -1, self.heads, self.dim_head)
                logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
                attn = jax.nn.softmax(logits * (self.dim_head ** -0.5), axis=-1)
                out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(self.dtype), v)
                out = out.reshape(B, N, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """attention.py:196-215: self-attn, cross-attn, GEGLU FF, each pre-LN residual."""
    dim: int
    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        x = CrossAttention(self.heads, self.dim_head, self.dim,
                           dtype=self.dtype, name="attn1")(ln("norm1")(x)) + x
        x = CrossAttention(self.heads, self.dim_head, self.dim, self.context_dim,
                           dtype=self.dtype, name="attn2")(ln("norm2")(x),
                                                           context=context) + x
        # FeedForward glu=True: GEGLU(dim→4·dim) → Linear(4·dim→dim) (attention.py:37-64)
        h = ln("norm3")(x)
        h = nn.Dense(self.dim * 8, dtype=self.dtype, param_dtype=jnp.float32,
                     name="ff_geglu")(h)
        a, gate = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(gate, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="ff_out")(h)
        return h + x


class SpatialTransformer(nn.Module):
    """attention.py:218-261: GroupNorm → 1×1 in → transformer block(s) → zero-init
    1×1 out, inner residual."""
    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        B, H, W, C = x.shape
        inner = self.heads * self.dim_head
        x_in = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                         param_dtype=jnp.float32, name="norm")(x)
        h = conv(inner, 1, use_bias=True, dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, inner)
        for d in range(self.depth):
            h = BasicTransformerBlock(inner, self.heads, self.dim_head,
                                      self.context_dim, dtype=self.dtype,
                                      name=f"block{d}")(h, context=context)
        h = h.reshape(B, H, W, inner)
        h = Conv1x1(C, use_bias=True, kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name="proj_out")(h)
        return h + x_in


class AttnWrap(nn.Module):
    """Residual(PreNorm(dim, attn)) (module_util.py:27-33,89-97).

    The LinearAttention child runs its fused Pallas path on TPU/bf16."""
    use_spatial: bool
    heads: int
    dim_head: int = 32
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        norm_mod = ChannelLayerNorm(dtype=self.dtype, name="norm")
        if not self.use_spatial:
            # LinearAttention gets the RAW x plus the prenorm gain: when the
            # fused kernel is available it runs the whole
            # Residual(PreNorm(LinearAttention)) in one op (v3,
            # ops/linear_attention.py:attn_wrap_fused); otherwise it applies
            # the norm itself and we add the residual here.
            _ = norm_mod(jnp.zeros((1, 1, 1, x.shape[-1]), self.dtype))
            g_pre = norm_mod.variables["params"]["g"]
            out, fused = LinearAttention(dtype=self.dtype, name="fn")(
                x, context=context, g_pre=g_pre)
            return out if fused else out + x
        h = norm_mod(x)
        h = SpatialTransformer(self.heads, self.dim_head,
                               context_dim=self.context_dim,
                               dtype=self.dtype, name="fn")(h, context=context)
        return h + x


class ConditionalUNet(nn.Module):
    """DenoisingUNet_arch.py:21-174.  forward(xt, cond, time, text_context,
    image_context) predicts the noise; input is cat(xt−cond, cond) on channels."""
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    context_dim: int = 512
    use_degra_context: bool = True
    use_image_context: bool = False
    upscale: int = 1            # unused (parity with reference signature)
    scale: float = 1.0          # wild-ir: 0.5 → internal down/upsample (:37-40)
    # levels with i >= this use SpatialTransformer instead of LinearAttention when
    # use_image_context; the daclip-sde reference hardcodes `i < 3` (arch :79-80),
    # wild-ir uses `i < depth-1` (its arch :83-84) — pass depth-1 for wild-ir.
    spatial_attn_min_level: int = 3
    # rematerialize block activations in the backward pass (the reference's
    # gradient checkpointing, module_util.py:300-346) — training memory knob
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xt, cond, time, text_context=None, image_context=None):
        depth = len(self.ch_mult)
        nf = self.nf
        time_dim = nf * 4
        cdim = -1 if self.context_dim is None else self.context_dim

        if jnp.ndim(time) == 0:
            time = jnp.full((xt.shape[0],), time, dtype=jnp.float32)

        RB = nn.remat(ResBlock, prevent_cse=False) if self.remat else ResBlock
        AW = nn.remat(AttnWrap, prevent_cse=False) if self.remat else AttnWrap

        x = jnp.concatenate([xt - cond, cond], axis=-1).astype(self.dtype)

        # reflect-pad H,W to a multiple of 2^depth (:111-116)
        Hh, Ww = x.shape[1], x.shape[2]
        s = 2 ** depth
        pad_h = (s - Hh % s) % s
        pad_w = (s - Ww % s) % s
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")

        x = conv(nf, 7, dtype=self.dtype, name="init_conv")(x)
        x_skip = x

        if self.scale == 0.5:
            x = Downsample2x(nf, dtype=self.dtype, name="pre_down")(x)

        # time embedding (:51-56)
        t = sinusoidal_pos_emb(time, nf)
        t = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_mlp_1")(t.astype(self.dtype))
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="time_mlp_2")(t)

        # degradation prompt injection (:58-63, :133-137)
        if cdim > 0 and self.use_degra_context and text_context is not None:
            prompt = self.param("prompt", nn.initializers.uniform(scale=1.0),
                                (1, time_dim), jnp.float32)
            pe = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                          name="text_mlp_1")(text_context.astype(self.dtype))
            pe = nn.silu(pe)
            pe = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                          name="text_mlp_2")(pe)
            pe = jax.nn.softmax(pe.astype(jnp.float32), axis=1).astype(self.dtype)
            pe = pe * prompt.astype(self.dtype)
            pe = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32,
                          name="prompt_mlp")(pe)
            t = t + pe

        if self.use_image_context and cdim > 0 and image_context is not None:
            image_context = image_context[:, None, :]  # (B, 1, cdim) (:139-140)

        ch = [1] + list(self.ch_mult)
        hs = []
        for i in range(depth):
            dim_in, dim_out = nf * ch[i], nf * ch[i + 1]
            spatial = (self.use_image_context and cdim > 0
                       and i >= self.spatial_attn_min_level)
            x = RB(dim_in, dtype=self.dtype, name=f"down{i}_block1")(x, t)
            hs.append(x)
            x = RB(dim_in, dtype=self.dtype, name=f"down{i}_block2")(x, t)
            x = AW(spatial, heads=dim_in // 32, context_dim=cdim,
                   dtype=self.dtype, name=f"down{i}_attn")(
                x, context=image_context)
            hs.append(x)
            if i != depth - 1:
                x = nn.Conv(dim_out, (4, 4), strides=2, padding=1, use_bias=True,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"down{i}_downsample")(x)
            else:
                x = conv(dim_out, 3, dtype=self.dtype, name=f"down{i}_downsample")(x)

        mid = nf * ch[-1]
        spatial_mid = self.use_image_context and cdim > 0
        x = RB(mid, dtype=self.dtype, name="mid_block1")(x, t)
        x = AW(spatial_mid, heads=mid // 32, context_dim=cdim,
               dtype=self.dtype, name="mid_attn")(x, context=image_context)
        x = RB(mid, dtype=self.dtype, name="mid_block2")(x, t)

        # Concat-free skip convolutions are opt-in and MEASURED SLOWER end to
        # end (chained full-forward at B32/256²: 150.1 ms vs 121.8 ms): two
        # half-width convs lose more conv-emitter/MXU efficiency than the
        # skip-concat copy costs.  Mechanism kept for future emitters.
        split_skip = flags.SPLIT_SKIP

        def rb_with_skip(block, x, skip):
            # conv(concat(x, skip)), optionally concat-free (see Block.skip)
            if split_skip:
                return block(x, t, skip)
            return block(jnp.concatenate([x, skip], axis=-1), t)

        for i in reversed(range(depth)):
            dim_in, dim_out = nf * ch[i], nf * ch[i + 1]
            spatial = (self.use_image_context and cdim > 0
                       and i >= self.spatial_attn_min_level)
            x = rb_with_skip(RB(dim_out, dtype=self.dtype,
                                name=f"up{i}_block1"), x, hs.pop())
            x = rb_with_skip(RB(dim_out, dtype=self.dtype,
                                name=f"up{i}_block2"), x, hs.pop())
            x = AW(spatial, heads=dim_out // 32, context_dim=cdim,
                   dtype=self.dtype, name=f"up{i}_attn")(
                x, context=image_context)
            if i != 0:
                x = Upsample2x(dim_in, dtype=self.dtype, name=f"up{i}_upsample")(x)
            else:
                x = conv(dim_in, 3, dtype=self.dtype, name=f"up{i}_upsample")(x)

        if self.scale == 0.5:
            x = Upsample2x(nf, dtype=self.dtype, name="post_up")(x)

        x = rb_with_skip(RB(nf, dtype=self.dtype, name="final_res_block"),
                         x, x_skip)
        x = TapDotConv3x3(self.out_nc, dtype=self.dtype, name="final_conv")(x)
        return x[:, :Hh, :Ww, :].astype(jnp.float32)


def _final_conv_plain(x, kernel, bias, dtype):
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(dtype)


def _final_conv_tap(x, kernel, bias, dtype):
    B, H, W, C = x.shape
    out_nc = kernel.shape[-1]
    w27 = kernel.transpose(2, 0, 1, 3).reshape(C, 9 * out_nc).astype(dtype)
    yt = jnp.dot(x.reshape(-1, C), w27).reshape(B, H, W, 9 * out_nc)
    yp = jnp.pad(yt, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B, H, W, out_nc), jnp.float32)
    for dr in range(3):
        for dw in range(3):
            t = 3 * dr + dw
            acc = acc + yp[:, dr:dr + H, dw:dw + W,
                           t * out_nc:(t + 1) * out_nc].astype(jnp.float32)
    return (acc + bias).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _final_conv(x, kernel, bias, dtype):
    """Tap-dot forward, plain-conv backward.

    The two forms are the same math (per-tap partials round to bf16 in the tap
    form — documented in TapDotConv3x3); the tap form's AUTODIFF backward is
    terrible (the 9-slice shift-add VJP materializes nine padded (B,H,W,9·nc)
    cotangent assemblies — measured +30 ms/step, the entire 58→52 samples/s
    round-2 training regression), while the plain conv's backward is XLA's
    standard conv-grad pair.  custom_vjp gives the fast forward AND the fast
    exact backward."""
    return _final_conv_tap(x, kernel, bias, dtype)


def _final_conv_fwd(x, kernel, bias, dtype):
    return _final_conv_tap(x, kernel, bias, dtype), (x, kernel, bias)


def _final_conv_bwd(dtype, res, g):
    x, kernel, bias = res
    _, vjp = jax.vjp(lambda *a: _final_conv_plain(*a, dtype), x, kernel, bias)
    return vjp(g)


_final_conv.defvjp(_final_conv_fwd, _final_conv_bwd)


class TapDotConv3x3(nn.Module):
    """3×3 conv with very few output channels (the UNet's final out_nc=3 head),
    evaluated as one tap-stacked matmul x·W(C, 9·out_nc) followed by a 9-slice
    shift-add — param-compatible with nn.Conv (kernel (3,3,C,out_nc), bias).

    Rationale: the TPU conv emitter pads the 3-channel output to full lanes
    and ran this op at 3.0-4.8 ms at B32/256² (profiled, BASELINE.md); the
    matmul form does the same math with K=C contraction and a cheap
    elementwise gather.  bf16-only (the per-tap partials round to bf16 before
    the f32 shift-add; the f32/CPU path keeps the exact single-conv form)."""
    out_nc: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.out_nc), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_nc,), jnp.float32)
        tap = self.dtype == jnp.bfloat16 and flags.TAP_FINAL
        if not tap:
            return _final_conv_plain(x, kernel, bias, self.dtype)
        return _final_conv(x, kernel, bias, self.dtype)


class Upsample2x(nn.Module):
    """nearest 2× + conv3x3(bias) (module_util.py:100-104).

    Two equivalent evaluations, chosen per shape:
      * polyphase (dim_out < 128): because nearest-2× duplicates pixels, the
        fine-grid 3×3 conv collapses per output phase (p,q)∈{0,1}² onto ≤2
        coarse taps per axis; evaluated as ONE coarse-res conv3×3(C→4·dim_out)
        (zero-padded per-phase taps) + pixel shuffle.  Same FLOPs but full MXU
        output lanes (N=4·dim_out vs dim_out) and no 2×-materialised
        intermediate — at up1 (256², 128→64) this replaces a 3.19 ms
        half-utilized conv + 1.05 ms broadcast (profiled).  Exact same math.
      * broadcast+reshape then conv (dim_out ≥ 128 — conv already full-width;
        measured ~25% faster than chained jnp.repeat)."""
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        m = nn.Conv(self.dim_out, (3, 3), padding=1, use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")
        poly = self.dim_out < 128 and flags.POLY_UP
        if not poly:
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (B, H, 2, W, 2, C)).reshape(B, 2 * H, 2 * W, C)
            return m(x)
        _ = m(jnp.zeros((1, 3, 3, C), x.dtype))
        k = m.variables["params"]["kernel"]  # (3,3,C,O)
        bias = m.variables["params"]["bias"]
        # R[da, p, dr] = [ floor((p+dr-1)/2) == da ]: which coarse tap (da ∈
        # {-1,0,1} → index 0..2) each fine tap dr lands on for output phase p
        R = np.zeros((3, 2, 3), np.float32)
        for p in range(2):
            for dr in range(3):
                R[(p + dr - 1) // 2 + 1, p, dr] = 1.0
        R = jnp.asarray(R)
        kp = jnp.einsum("apr,bqs,rsio->abipqo", R, R, k)
        kp = kp.reshape(3, 3, C, 4 * self.dim_out).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kp, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        # pixel shuffle via transpose (measured 109.1 vs 110.7 ms full-forward
        # against a channel-slice + row-stack formulation); bias added AFTER
        # the shuffle (per-channel) so no elementwise pass sits between the
        # conv output and the transpose copy
        y = y.reshape(B, H, W, 2, 2, self.dim_out)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
            B, 2 * H, 2 * W, self.dim_out)
        return y + bias.astype(self.dtype)


class Downsample2x(nn.Module):
    """conv4x4 stride2 pad1 (module_util.py:107-108)."""
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.dim_out, (4, 4), strides=2, padding=1, use_bias=True,
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")(x)
