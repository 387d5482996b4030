"""Fused Pallas TPU kernel for the UNet's channel linear attention
(module_util.py:157-185 math — see models/unet.py:LinearAttention).

The XLA version materializes several n-sized intermediates in HBM (q-softmax,
k-exp, plus the qkv/out streams): ~8 GB of traffic per L0 call at B32/256²,
measured 29 ms.  This kernel computes the same math in two passes over n with
all statistics resident in VMEM:

  pass A (per n-chunk): online-softmax accumulate  m(H), s(H) and the context
         ctx[d,e] += exp(k-m)ᵀ·v   with rescaling when m updates,
  pass B (per n-chunk): out = softmax_head(q) @ W, where
         W = ctx ∘ blockdiag / (s·n) · d^(-1/2)  is built once per batch.

Traffic = read k,v + read q + write out ≈ 2 GB at the same shape (~4x less).
Grid = (B, 2 phases, n/CHUNK), sequential on TPU; scratch persists across grid
steps.  Output blocks are written in both phases; the phase-1 write is last and
wins.  Numerics: f32 statistics/accumulation, bf16 streams — matches the XLA
path to bf16 rounding (see tests/test_ops.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEADS = 4
DIM_HEAD = 32
HID = HEADS * DIM_HEAD  # 128


def _kernel(qkv_ref, out_ref, m_ref, s_ref, ctx_ref, w_ref, *, n, chunk):
    phase = pl.program_id(1)
    c = pl.program_id(2)

    blk = qkv_ref[0]                                    # (chunk, 3*HID) bf16

    @pl.when((phase == 0) & (c == 0))
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        s_ref[:] = jnp.zeros_like(s_ref)
        ctx_ref[:] = jnp.zeros_like(ctx_ref)

    @pl.when(phase == 0)
    def _accumulate():
        k = blk[:, HID:2 * HID].astype(jnp.float32)     # (chunk, HID)
        v = blk[:, 2 * HID:]                            # bf16
        m_old = m_ref[:]                                # (1, HID) f32
        m_new = jnp.maximum(m_old, jnp.max(k, axis=0, keepdims=True))
        alpha = jnp.exp(m_old - m_new)                  # (1, HID)
        p = jnp.exp(k - m_new).astype(jnp.bfloat16)     # (chunk, HID)
        s_ref[:] = s_ref[:] * alpha + jnp.sum(
            p.astype(jnp.float32), axis=0, keepdims=True)
        ctx_ref[:] = ctx_ref[:] * alpha.reshape(HID, 1) + jax.lax.dot_general(
            p, v, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when((phase == 1) & (c == 0))
    def _finalize_w():
        # W[d,e] = ctx[d,e]·blockdiag(d,e)·scale/(s[d]·n)
        d_ids = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 0) // DIM_HEAD
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 1) // DIM_HEAD
        mask = (d_ids == e_ids).astype(jnp.float32)
        rowscale = (DIM_HEAD ** -0.5) / (s_ref[:].reshape(HID, 1) * n)
        w_ref[:] = (ctx_ref[:] * mask * rowscale).astype(jnp.bfloat16)

    @pl.when(phase == 1)
    def _output():
        q = blk[:, :HID].astype(jnp.float32)
        # per-head softmax over the 32-lane groups without lane reshapes:
        # head-sums via a block-diagonal ones matmul broadcast back to lanes
        d_ids = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 0) // DIM_HEAD
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 1) // DIM_HEAD
        ones_bd = (d_ids == e_ids).astype(jnp.float32)
        # stabilise with the global per-column k... q is post-LN/linear: bounded;
        # subtract a per-chunk global max for safety (exact softmax ratio)
        q = q - jnp.max(q)
        q_exp = jnp.exp(q)
        denom = jax.lax.dot_general(q_exp, ones_bd, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        q_soft = (q_exp / denom).astype(jnp.bfloat16)
        out_ref[0] = jax.lax.dot_general(
            q_soft, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def linear_attention_pallas(qkv: jnp.ndarray, interpret: bool = False):
    """qkv (B, n, 3*128) bf16 [q|k|v] → (B, n, 128) attention output (pre
    to_out projection).  n must be a multiple of the chunk (1024)."""
    B, n, three_h = qkv.shape
    assert three_h == 3 * HID, three_h
    chunk = 1024 if n % 2048 else 2048
    assert n % chunk == 0, (n, chunk)

    grid = (B, 2, n // chunk)
    return pl.pallas_call(
        functools.partial(_kernel, n=n, chunk=chunk),
        grid=grid,
        in_specs=[pl.BlockSpec((1, chunk, 3 * HID),
                               lambda b, p, c: (b, c, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk, HID), lambda b, p, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, HID), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, HID), jnp.float32),    # running max m
            pltpu.VMEM((1, HID), jnp.float32),    # running sum s
            pltpu.VMEM((HID, HID), jnp.float32),  # context accumulator
            pltpu.VMEM((HID, HID), jnp.bfloat16),  # finalized W
        ],
        interpret=interpret,
    )(qkv)


def _kernel_fused(xn_ref, gpre_ref, wqkv_ref, wout_ref, bout_ref, gout_ref,
                  out_ref, m_ref, s_ref, ctx_ref, w_ref, *, n, chunk, C,
                  prenorm_residual):
    """v2/v3: fuses the to_qkv matmul (pass A computes k,v = xn@Wkv; pass B
    computes q = xn@Wq), the to_out projection and its ChannelLayerNorm — the
    qkv tensor is never materialized in HBM.  With prenorm_residual=True the
    input is RAW x: the PreNorm ChannelLayerNorm is recomputed per pass and the
    residual add happens in pass B (the whole Residual(PreNorm(LinearAttention))
    in one kernel)."""
    phase = pl.program_id(1)
    c = pl.program_id(2)
    x_raw = xn_ref[0]                                    # (chunk, C) bf16
    if prenorm_residual:
        xf = x_raw.astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
        xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
              * gpre_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
    else:
        xn = x_raw

    @pl.when((phase == 0) & (c == 0))
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        s_ref[:] = jnp.zeros_like(s_ref)
        ctx_ref[:] = jnp.zeros_like(ctx_ref)

    @pl.when(phase == 0)
    def _accumulate():
        kv = jax.lax.dot_general(xn, wqkv_ref[:, HID:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        k = kv[:, :HID]
        v = kv[:, HID:].astype(jnp.bfloat16)
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, jnp.max(k, axis=0, keepdims=True))
        alpha = jnp.exp(m_old - m_new)
        p = jnp.exp(k - m_new).astype(jnp.bfloat16)
        s_ref[:] = s_ref[:] * alpha + jnp.sum(
            p.astype(jnp.float32), axis=0, keepdims=True)
        ctx_ref[:] = ctx_ref[:] * alpha.reshape(HID, 1) + jax.lax.dot_general(
            p, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_ref[:] = m_new

    @pl.when((phase == 1) & (c == 0))
    def _finalize_w():
        d_ids = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 0) // DIM_HEAD
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 1) // DIM_HEAD
        mask = (d_ids == e_ids).astype(jnp.float32)
        rowscale = (DIM_HEAD ** -0.5) / (s_ref[:].reshape(HID, 1) * n)
        w_ref[:] = (ctx_ref[:] * mask * rowscale).astype(jnp.bfloat16)

    @pl.when(phase == 1)
    def _output():
        q = jax.lax.dot_general(xn, wqkv_ref[:, :HID], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        d_ids = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 0) // DIM_HEAD
        e_ids = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 1) // DIM_HEAD
        ones_bd = (d_ids == e_ids).astype(jnp.float32)
        q = q - jnp.max(q)
        q_exp = jnp.exp(q)
        denom = jax.lax.dot_general(q_exp, ones_bd, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        q_soft = (q_exp / denom).astype(jnp.bfloat16)
        attn = jax.lax.dot_general(q_soft, w_ref[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        # to_out projection + bias + ChannelLayerNorm (module_util.py:77-86)
        y = jax.lax.dot_general(attn.astype(jnp.bfloat16), wout_ref[:],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y = y + bout_ref[:].astype(jnp.float32)
        mu = jnp.mean(y, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=1, keepdims=True)
        y = (y - mu) * jax.lax.rsqrt(var + 1e-5) * gout_ref[:].astype(jnp.float32)
        if prenorm_residual:
            y = y + x_raw.astype(jnp.float32)
        out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "prenorm_residual"))
def linear_attention_fused_pallas(xn: jnp.ndarray, w_qkv: jnp.ndarray,
                                  w_out: jnp.ndarray, b_out: jnp.ndarray,
                                  g_out: jnp.ndarray,
                                  g_pre: jnp.ndarray = None,
                                  prenorm_residual: bool = False,
                                  interpret: bool = False):
    """Fully fused LinearAttention: xn (B, n, C) input (pre-normalized, or RAW
    when prenorm_residual=True — then the PreNorm LN with g_pre and the residual
    add are fused too), w_qkv (C, 384), w_out (128, C), b_out/g_out/g_pre (C,)."""
    B, n, C = xn.shape
    chunk = 1024 if n % 2048 else 2048
    assert n % chunk == 0, (n, chunk)
    if g_pre is None:
        g_pre = jnp.ones((C,), xn.dtype)
    grid = (B, 2, n // chunk)
    return pl.pallas_call(
        functools.partial(_kernel_fused, n=n, chunk=chunk, C=C,
                          prenorm_residual=prenorm_residual),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda b, p, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * HID), lambda b, p, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, C), lambda b, p, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, p, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, C), lambda b, p, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, C), xn.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, HID), jnp.float32),
            pltpu.VMEM((1, HID), jnp.float32),
            pltpu.VMEM((HID, HID), jnp.float32),
            pltpu.VMEM((HID, HID), jnp.bfloat16),
        ],
        interpret=interpret,
    )(xn, g_pre.reshape(1, -1), w_qkv, w_out, b_out.reshape(1, -1),
      g_out.reshape(1, -1))


def _kernel_stats(xn_ref, wkv_ref, ctx_out, s_out, m_ref, s_ref, ctx_ref,
                  *, nchunks):
    """v4 pass A as its own kernel: accumulate the online-softmax k statistics
    and the exp(k)ᵀv context; emit them once per batch element.  Separating the
    passes removes the two-phase kernel's redundant output-block writes (the
    phase-0 visits wrote garbage out blocks — ~268 MB/call of wasted DMA at
    the production L0 shape, visible in the profiler trace)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        s_ref[:] = jnp.zeros_like(s_ref)
        ctx_ref[:] = jnp.zeros_like(ctx_ref)

    xn = xn_ref[0]
    kv = jax.lax.dot_general(xn, wkv_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    k = kv[:, :HID]
    v = kv[:, HID:].astype(jnp.bfloat16)
    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(k, axis=0, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    p = jnp.exp(k - m_new).astype(jnp.bfloat16)
    s_ref[:] = s_ref[:] * alpha + jnp.sum(p.astype(jnp.float32), axis=0,
                                          keepdims=True)
    ctx_ref[:] = ctx_ref[:] * alpha.reshape(HID, 1) + jax.lax.dot_general(
        p, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(c == nchunks - 1)
    def _emit():
        ctx_out[0] = ctx_ref[:]
        s_out[0] = s_ref[:]


def _kernel_apply(xn_ref, wq_ref, w_ref, wout_ref, bout_ref, gout_ref,
                  out_ref):
    """v4 pass B: q-softmax → @W → to_out → ChannelLayerNorm, one visit per
    output block."""
    xn = xn_ref[0]
    q = jax.lax.dot_general(xn, wq_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 0) // DIM_HEAD
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 1) // DIM_HEAD
    ones_bd = (d_ids == e_ids).astype(jnp.float32)
    q = q - jnp.max(q)
    q_exp = jnp.exp(q)
    denom = jax.lax.dot_general(q_exp, ones_bd, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    q_soft = (q_exp / denom).astype(jnp.bfloat16)
    attn = jax.lax.dot_general(q_soft, w_ref[0], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    y = jax.lax.dot_general(attn.astype(jnp.bfloat16), wout_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + bout_ref[:].astype(jnp.float32)
    mu = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=1, keepdims=True)
    y = (y - mu) * jax.lax.rsqrt(var + 1e-5) * gout_ref[:].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def linear_attention_fused_v4(xn: jnp.ndarray, w_qkv: jnp.ndarray,
                              w_out: jnp.ndarray, b_out: jnp.ndarray,
                              g_out: jnp.ndarray, interpret: bool = False):
    """Two single-pass kernels (stats → apply) with the tiny W finalisation in
    XLA between them.  Same math as linear_attention_fused_pallas."""
    B, n, C = xn.shape
    chunk = 1024 if n % 2048 else 2048
    assert n % chunk == 0, (n, chunk)
    nchunks = n // chunk

    ctx, s = pl.pallas_call(
        functools.partial(_kernel_stats, nchunks=nchunks),
        grid=(B, nchunks),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * HID), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, HID, HID), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HID), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, HID, HID), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, HID), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((1, HID), jnp.float32),
            pltpu.VMEM((1, HID), jnp.float32),
            pltpu.VMEM((HID, HID), jnp.float32),
        ],
        interpret=interpret,
    )(xn, w_qkv[:, HID:])

    # W finalisation (tiny, XLA): blockdiag mask · scale / (s·n)
    d_ids = jnp.arange(HID) // DIM_HEAD
    mask = (d_ids[:, None] == d_ids[None, :]).astype(jnp.float32)
    rowscale = (DIM_HEAD ** -0.5) / (s.reshape(B, HID, 1) * n)
    w = (ctx * mask * rowscale).astype(jnp.bfloat16)

    return pl.pallas_call(
        _kernel_apply,
        grid=(B, nchunks),
        in_specs=[
            pl.BlockSpec((1, chunk, C), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, HID), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HID, HID), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HID, C), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, C), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, C), xn.dtype),
        interpret=interpret,
    )(xn, w_qkv[:, :HID], w, w_out, b_out.reshape(1, -1), g_out.reshape(1, -1))


def _group_ones(PC: int, C: int):
    """(PC, PC) group-blockdiag ones: M[k,j] = [k//C == j//C]."""
    gk = jax.lax.broadcasted_iota(jnp.int32, (PC, PC), 0) // C
    gj = jax.lax.broadcasted_iota(jnp.int32, (PC, PC), 1) // C
    return (gk == gj).astype(jnp.float32)


def _ln_mxu(x_raw, g, C):
    """Per-C-group ChannelLayerNorm of a (rows, P·C) block with the cross-lane
    mean/var reductions done as MXU dots against a group-blockdiag ones matrix
    — VPU lane reductions on C=64 f32 blocks measured ~1.7 ms per 268 MB
    stream, most of the first v5 attempt's overhead.  The dot against M both
    reduces within each group and broadcasts the result back to its lanes."""
    xf = x_raw.astype(jnp.float32)
    norm, _ = _ln_parts(xf, C)
    return norm * g.astype(jnp.float32), xf


def _blockdiag(w, P):
    """(R, S) → (P·R, P·S) block-diagonal tiling: diag(w, …, w)."""
    if P == 1:
        return w
    R, S = w.shape
    tiled = jnp.tile(w, (P, P))
    gk = jax.lax.broadcasted_iota(jnp.int32, (P * R, P * S), 0) // R
    gj = jax.lax.broadcasted_iota(jnp.int32, (P * R, P * S), 1) // S
    return jnp.where(gk == gj, tiled, jnp.zeros_like(tiled))


def _kernel_stats_v5(x_ref, gpre_ref, wkv_ref, ctx_out, s_out, m_out, m_ref,
                     s_ref, ctx_ref, *, nchunks, C, P):
    """v5/v6 stats kernel: v4's pass A taking RAW x with the PreNorm
    ChannelLayerNorm computed inline (MXU-dot reductions, see _ln_mxu).

    When C < 128 the caller packs P = 128//C pixels per row ((B, n/P, P·C)
    view — a free reshape) so DMA tiles, VPU lanes, and the kv matmul's MXU
    contraction dim are all full; weights arrive block-diagonal (_blockdiag)
    and the P per-pixel column groups are reduced into the shared statistics
    with static lane slices."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        s_ref[:] = jnp.zeros_like(s_ref)
        ctx_ref[:] = jnp.zeros_like(ctx_ref)

    xn, _ = _ln_mxu(x_ref[0], gpre_ref[:], C)
    xn = xn.astype(jnp.bfloat16)
    kv = jax.lax.dot_general(xn, wkv_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # kv columns: P groups of [k (HID) | v (HID)]
    ks = [kv[:, j * 2 * HID:j * 2 * HID + HID] for j in range(P)]
    vs = [kv[:, j * 2 * HID + HID:(j + 1) * 2 * HID].astype(jnp.bfloat16)
          for j in range(P)]
    m_old = m_ref[:]
    m_blk = ks[0]
    for j in range(1, P):
        m_blk = jnp.maximum(m_blk, ks[j])
    m_new = jnp.maximum(m_old, jnp.max(m_blk, axis=0, keepdims=True))
    alpha = jnp.exp(m_old - m_new)
    s_add = jnp.zeros_like(s_ref[:])
    ctx_add = jnp.zeros_like(ctx_ref[:])
    for j in range(P):
        p = jnp.exp(ks[j] - m_new).astype(jnp.bfloat16)
        s_add = s_add + jnp.sum(p.astype(jnp.float32), axis=0, keepdims=True)
        ctx_add = ctx_add + jax.lax.dot_general(
            p, vs[j], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    s_ref[:] = s_ref[:] * alpha + s_add
    ctx_ref[:] = ctx_ref[:] * alpha.reshape(HID, 1) + ctx_add
    m_ref[:] = m_new

    @pl.when(c == nchunks - 1)
    def _emit():
        ctx_out[0] = ctx_ref[:]
        s_out[0] = s_ref[:]
        m_out[0] = m_ref[:]


def _kernel_apply_v5(x_ref, gpre_ref, wq_ref, w_ref, wout_ref, bout_ref,
                     gout_ref, out_ref, *, C, P):
    """v5/v6 apply kernel: v4's pass B taking RAW x — prenorm LN recomputed
    inline (MXU-dot reductions), Residual add folded into the output write,
    and P pixels packed per row when C < 128 (see _kernel_stats_v5)."""
    xn, xf = _ln_mxu(x_ref[0], gpre_ref[:], C)
    xn = xn.astype(jnp.bfloat16)
    q = jax.lax.dot_general(xn, wq_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    PH = P * HID
    # per-pixel-group, per-head softmax over the packed q columns
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (PH, PH), 0) // DIM_HEAD
    e_ids = jax.lax.broadcasted_iota(jnp.int32, (PH, PH), 1) // DIM_HEAD
    ones_bd = (d_ids == e_ids).astype(jnp.float32)
    q = q - jnp.max(q)
    q_exp = jnp.exp(q)
    denom = jax.lax.dot_general(q_exp, ones_bd, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    q_soft = (q_exp / denom).astype(jnp.bfloat16)
    w2 = w_ref[0]
    if P > 1:
        tw = jnp.tile(w2, (P, P))
        gk = jax.lax.broadcasted_iota(jnp.int32, (PH, PH), 0) // HID
        gj = jax.lax.broadcasted_iota(jnp.int32, (PH, PH), 1) // HID
        w2 = jnp.where(gk == gj, tw, jnp.zeros_like(tw))
    attn = jax.lax.dot_general(q_soft, w2, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    y = jax.lax.dot_general(attn.astype(jnp.bfloat16), wout_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + bout_ref[:].astype(jnp.float32)
    y, _ = _ln_mxu(y, gout_ref[:], C)
    out_ref[0] = (y + xf).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "with_stats"))
def attn_wrap_v5(x: jnp.ndarray, g_pre: jnp.ndarray, w_qkv: jnp.ndarray,
                 w_out: jnp.ndarray, b_out: jnp.ndarray, g_out: jnp.ndarray,
                 interpret: bool = False, with_stats: bool = False):
    """Whole Residual(PreNorm(LinearAttention)) on RAW x via the v4 SPLIT
    kernel structure (stats → tiny XLA W finalisation → apply).  Unlike the
    retired v3 two-phase wrap (which paid redundant phase-0 output writes and
    measured slower), this keeps v4's single-visit output writes.

    DACLIP_TPU_ATTN_PACK=1 packs pixel PAIRS per row at C=64 (P=2,
    block-diagonal weights) so DMA tiles / VPU lanes / MXU contraction rows
    are full instead of half-empty — measured a WASH at full-forward level
    (106.2 vs 106.0 ms B32/256²: the kernels are MXU-bound after the _ln_mxu
    fix, and packing trades lane occupancy for 2× matmul width at identical
    MXU time).  Default off."""
    from daclip_tpu import flags

    B, n, C = x.shape
    P = 2 if (C == 64 and n % 2048 == 0 and flags.ATTN_PACK) else 1
    nP, PC = n // P, P * C
    xp = x.reshape(B, nP, PC)
    chunk = 1024 if nP % 2048 else 2048
    assert nP % chunk == 0, (n, P, chunk)
    nchunks = nP // chunk
    gpre2 = jnp.tile(g_pre, P).reshape(1, -1)
    wkv2 = _blockdiag(w_qkv[:, HID:], P)      # (PC, P·2HID)
    wq2 = _blockdiag(w_qkv[:, :HID], P)       # (PC, P·HID)
    wout2 = _blockdiag(w_out, P)              # (P·HID, PC)

    ctx, s, m = pl.pallas_call(
        functools.partial(_kernel_stats_v5, nchunks=nchunks, C=C, P=P),
        grid=(B, nchunks),
        in_specs=[
            pl.BlockSpec((1, chunk, PC), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PC), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PC, P * 2 * HID), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, HID, HID), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HID), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, HID), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, HID, HID), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, HID), jnp.float32),
                   jax.ShapeDtypeStruct((B, 1, HID), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((1, HID), jnp.float32),
            pltpu.VMEM((1, HID), jnp.float32),
            pltpu.VMEM((HID, HID), jnp.float32),
        ],
        interpret=interpret,
    )(xp, gpre2, wkv2)

    d_ids = jnp.arange(HID) // DIM_HEAD
    mask = (d_ids[:, None] == d_ids[None, :]).astype(jnp.float32)
    rowscale = (DIM_HEAD ** -0.5) / (s.reshape(B, HID, 1) * n)
    w = (ctx * mask * rowscale).astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_kernel_apply_v5, C=C, P=P),
        grid=(B, nchunks),
        in_specs=[
            pl.BlockSpec((1, chunk, PC), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PC), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PC, P * HID), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HID, HID), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P * HID, PC), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PC), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PC), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, PC), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nP, PC), x.dtype),
        interpret=interpret,
    )(xp, gpre2, wq2, w, wout2, jnp.tile(b_out, P).reshape(1, -1),
      jnp.tile(g_out, P).reshape(1, -1))
    out = out.reshape(B, n, C)
    if with_stats:
        return out, ctx, s, m
    return out


@jax.custom_vjp
def attn_wrap_fused_v5(x, g_pre, w_qkv, w_out, b_out, g_out):
    """Differentiable Residual(PreNorm(LinearAttention)): v5 split-kernel
    Pallas forward, XLA-reference backward (same pattern as
    linear_attention_fused)."""
    return attn_wrap_v5(x, g_pre, w_qkv, w_out, b_out, g_out)


def _wrap_v5_fwd(x, g_pre, w_qkv, w_out, b_out, g_out):
    out, ctx, s, m = attn_wrap_v5(x, g_pre, w_qkv, w_out, b_out, g_out,
                                  with_stats=True)
    return out, (x, g_pre, w_qkv, w_out, b_out, g_out, ctx, s, m)


def _ln_and_stats(t):
    """Channel-LN pieces: (normalized rows, rsqrt(var+eps)) in f32."""
    tf = t.astype(jnp.float32)
    mu = tf.mean(-1, keepdims=True)
    tc = tf - mu
    var = (tc * tc).mean(-1, keepdims=True)
    r = jax.lax.rsqrt(var + 1e-5)
    return tc * r, r


def _ln_bwd(dout_times_g, norm, r):
    """VJP of norm(t) given dnorm (= upstream ∘ gain), norm(t), r."""
    mean_dn = dout_times_g.mean(-1, keepdims=True)
    mean_dn_n = (dout_times_g * norm).mean(-1, keepdims=True)
    return r * (dout_times_g - mean_dn - norm * mean_dn_n)


def _wrap_v5_bwd_manual(res, g):
    """Hand-derived VJP of the Residual(PreNorm(LinearAttention)) wrap with
    every n-sized matmul in bf16 (f32 reserved for statistics/elementwise).

    jax.vjp of the reference composition runs its big cotangent contractions
    (de = v·dctxᵀ, dv = e·dctx, dctx outer products, dqkv·Wᵀ) in f32 because
    the cotangents are f32 — the TPU MXU f32 path is ~8× slower than bf16
    (the bnx,bny->bxy backward dots profiled at 7 TF/s / 4.7 ms each at
    B16/256²).  Mathematically this is the exact gradient of the same
    function; matmul operands round to bf16 exactly like the forward does.

    The softmax max-shifts (k_max, q global max) are treated as constants:
    both normalized forms are algebraically shift-invariant, so their
    gradient contribution is identically zero."""
    x, g_pre, w_qkv, w_out, b_out, g_out = res
    dt = x.dtype
    B, n, C = x.shape
    scale = DIM_HEAD ** -0.5

    # ---- recompute forward pieces (reference composition arithmetic) ----
    nx, r_x = _ln_and_stats(x)
    xn = (nx * g_pre.astype(jnp.float32)).astype(dt)
    qkv = jnp.einsum("bnc,cd->bnd", xn, w_qkv)
    q, k, v = (qkv[..., :HID], qkv[..., HID:2 * HID], qkv[..., 2 * HID:])
    qh = q.reshape(B, n, HEADS, DIM_HEAD).astype(jnp.float32)
    q_soft = jax.nn.softmax(qh, axis=-1).reshape(B, n, HID).astype(dt)
    k_max = jnp.max(k, axis=1, keepdims=True).astype(jnp.float32)
    e = jnp.exp(k.astype(jnp.float32) - k_max).astype(dt)
    s = jnp.sum(e, axis=1, dtype=jnp.float32)            # (B, HID)
    ctx = jnp.einsum("bnx,bny->bxy", e, v).astype(jnp.float32)
    d_ids = jnp.arange(HID) // DIM_HEAD
    mask = (d_ids[:, None] == d_ids[None, :]).astype(jnp.float32)
    rowscale = scale / (s[..., None] * n)                # (B, HID, 1)
    w = (ctx * mask * rowscale).astype(dt)               # (B, HID, HID)
    attn = jnp.einsum("bnx,bxy->bny", q_soft, w)
    y = (jnp.einsum("bnh,hc->bnc", attn, w_out)
         + b_out).astype(jnp.float32)
    ny, r_y = _ln_and_stats(y)

    # ---- backward ----
    gf = g.astype(jnp.float32)
    dg_out = jnp.einsum("bnc,bnc->c", gf, ny)
    dy = _ln_bwd(gf * g_out.astype(jnp.float32), ny, r_y)
    db_out = jnp.sum(dy, axis=(0, 1))
    dy_b = dy.astype(dt)
    dattn = jnp.einsum("bnc,hc->bnh", dy_b, w_out)
    dw_out = jnp.einsum("bnh,bnc->hc", attn.astype(dt), dy_b)
    dattn_b = dattn.astype(dt)
    dq_soft = jnp.einsum("bny,bxy->bnx", dattn_b, w).astype(jnp.float32)
    dw = jnp.einsum("bnx,bny->bxy", q_soft, dattn_b).astype(jnp.float32)
    # softmax-over-heads backward
    qs = q_soft.astype(jnp.float32).reshape(B, n, HEADS, DIM_HEAD)
    dqs = dq_soft.reshape(B, n, HEADS, DIM_HEAD)
    dq = (qs * (dqs - jnp.sum(dqs * qs, axis=-1, keepdims=True))
          ).reshape(B, n, HID)
    # W = mask ∘ ctx ∘ rowscale;  rowscale = scale/(s·n)
    dctx = dw * mask * rowscale                          # (B, HID, HID) f32
    ds = -jnp.sum(dctx * ctx, axis=-1) / s               # (B, HID)
    dctx_b = dctx.astype(dt)
    de = (jnp.einsum("bny,bxy->bnx", v, dctx_b).astype(jnp.float32)
          + ds[:, None, :])
    dk = e.astype(jnp.float32) * de
    dv = jnp.einsum("bnx,bxy->bny", e, dctx_b).astype(jnp.float32)
    dqkv = jnp.concatenate(
        [dq.astype(dt), dk.astype(dt), dv.astype(dt)], axis=-1)
    dxn = jnp.einsum("bnd,cd->bnc", dqkv, w_qkv).astype(jnp.float32)
    dw_qkv = jnp.einsum("bnc,bnd->cd", xn, dqkv)
    dg_pre = jnp.einsum("bnc,bnc->c", dxn, nx)
    dx = gf + _ln_bwd(dxn * g_pre.astype(jnp.float32), nx, r_x)
    return (dx.astype(dt), dg_pre.astype(g_pre.dtype),
            dw_qkv.astype(w_qkv.dtype), dw_out.astype(w_out.dtype),
            db_out.astype(b_out.dtype), dg_out.astype(g_out.dtype))


def _ln_parts(xf, C):
    """(norm rows, r) of a (rows, P·C) f32 block, per-C-group, reductions as
    MXU ones-dots (single source of the kernel-side LN math — _ln_mxu and
    both backward kernels share it)."""
    PC = xf.shape[1]
    M = _group_ones(PC, C)
    mu = jax.lax.dot_general(xf, M, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / C
    xc = xf - mu
    var = jax.lax.dot_general(xc * xc, M, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32) / C
    r = jax.lax.rsqrt(var + 1e-5)
    return xc * r, r


def _ln_bwd_rows(dn, norm, r, C):
    """Row-wise LN VJP with MXU-dot reductions (dn = upstream ∘ gain)."""
    M = _group_ones(C, C)
    t1 = jax.lax.dot_general(dn, M, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / C
    t2 = jax.lax.dot_general(dn * norm, M, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / C
    return r * (dn - t1 - norm * t2)


def _ones_bd_heads():
    d = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 0) // DIM_HEAD
    e = jax.lax.broadcasted_iota(jnp.int32, (HID, HID), 1) // DIM_HEAD
    return (d == e).astype(jnp.float32)


def _recompute_x_side(x_ref, gpre_ref, wq_ref, C):
    """Chunk-local recompute of the input-side forward pieces (prenorm LN,
    gained rows, query softmax) — everything the backward needs that does NOT
    go through the postnorm."""
    norm_x, r_x = _ln_parts(x_ref[0].astype(jnp.float32), C)
    xn = (norm_x * gpre_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)
    q = jax.lax.dot_general(xn, wq_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    ones_bd = _ones_bd_heads()
    q = q - jnp.max(q)
    q_exp = jnp.exp(q)
    denom = jax.lax.dot_general(q_exp, ones_bd, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    q_soft = q_exp / denom
    q_soft_b = q_soft.astype(jnp.bfloat16)
    return norm_x, r_x, xn, q_soft, q_soft_b, ones_bd


def _recompute_to_dy(x_ref, g_ref, gpre_ref, wq_ref, w_ref, wout_ref,
                     bout_ref, gout_ref, C):
    """Shared chunk-local recompute: forward pieces through y's LN plus the
    upstream-through-postnorm cotangent dy.  Returns what both backward
    kernels need."""
    norm_x, r_x, xn, q_soft, q_soft_b, ones_bd = _recompute_x_side(
        x_ref, gpre_ref, wq_ref, C)
    attn_b = jax.lax.dot_general(
        q_soft_b, w_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    y = jax.lax.dot_general(attn_b, wout_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ) + bout_ref[:].astype(jnp.float32)
    norm_y, r_y = _ln_parts(y, C)
    gf = g_ref[0].astype(jnp.float32)
    dn = gf * gout_ref[:].astype(jnp.float32)
    dy = _ln_bwd_rows(dn, norm_y, r_y, C)
    dy_b = dy.astype(jnp.bfloat16)
    dattn = jax.lax.dot_general(dy_b, wout_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return (norm_x, r_x, xn, q_soft, q_soft_b, attn_b, norm_y, gf, dy, dy_b,
            dattn, ones_bd)


def _kernel_bwd1_v5(x_ref, g_ref, gpre_ref, wq_ref, w_ref, wout_ref, bout_ref,
                    gout_ref, dW_ref, dwout_ref, dgout_ref, dbout_ref,
                    dy_ref=None, *, C):
    """Backward pass 1: accumulate the per-batch dW = q_softᵀ·dattn (needed
    globally before dk/dv exist) plus the w_out/b_out/g_out cotangent
    partials.  Grid (B, nchunks); accumulator outputs indexed by b only stay
    resident in VMEM across the chunk loop.  With a fifth output (dy_ref,
    flags.V5_DY_SPILL) the chunk's dy_b is spilled so pass 2 can skip the
    postnorm recompute — bit-identical, since pass 2 consumes dy only via
    this bf16 cast."""
    c = pl.program_id(1)
    (norm_x, r_x, xn, q_soft, q_soft_b, attn_b, norm_y, gf, dy, dy_b,
     dattn, ones_bd) = _recompute_to_dy(x_ref, g_ref, gpre_ref, wq_ref,
                                        w_ref, wout_ref, bout_ref, gout_ref,
                                        C)
    dattn_b = dattn.astype(jnp.bfloat16)
    dW_c = jax.lax.dot_general(q_soft_b, dattn_b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dwout_c = jax.lax.dot_general(attn_b, dy_b, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dgout_c = jnp.sum(gf * norm_y, axis=0, keepdims=True)
    dbout_c = jnp.sum(dy, axis=0, keepdims=True)
    if dy_ref is not None:
        dy_ref[0] = dy_b

    @pl.when(c == 0)
    def _init():
        dW_ref[0] = dW_c
        dwout_ref[0] = dwout_c
        dgout_ref[0] = dgout_c
        dbout_ref[0] = dbout_c

    @pl.when(c != 0)
    def _acc():
        dW_ref[0] += dW_c
        dwout_ref[0] += dwout_c
        dgout_ref[0] += dgout_c
        dbout_ref[0] += dbout_c


def _bwd2_tail(gpre_ref, wqkv_ref, w_ref, dctx_ref, ds_ref, m_ref,
               dx_ref, dwqkv_ref, dgpre_ref,
               norm_x, r_x, xn, q_soft, gf, dattn, ones_bd, C):
    """Shared tail of backward pass 2: with the global dctx/ds known, produce
    dx (residual + prenorm-LN backward of dxn) and accumulate
    dW_qkv / dg_pre."""
    c = pl.program_id(1)
    kv = jax.lax.dot_general(xn, wqkv_ref[:, HID:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    k, v = kv[:, :HID], kv[:, HID:]
    e = jnp.exp(k - m_ref[0].astype(jnp.float32))
    e_b = e.astype(jnp.bfloat16)
    v_b = v.astype(jnp.bfloat16)
    dattn_b = dattn.astype(jnp.bfloat16)
    dq_soft = jax.lax.dot_general(dattn_b, w_ref[0], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    tsum = jax.lax.dot_general(dq_soft * q_soft, ones_bd,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dq = q_soft * (dq_soft - tsum)
    dctx = dctx_ref[0]
    de = jax.lax.dot_general(v_b, dctx, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ) + ds_ref[0].astype(jnp.float32)
    dk = e * de
    dv = jax.lax.dot_general(e_b, dctx, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dqkv = jnp.concatenate([dq, dk, dv], axis=1).astype(jnp.bfloat16)
    dxn = jax.lax.dot_general(dqkv, wqkv_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    gpre = gpre_ref[:].astype(jnp.float32)
    dxln = _ln_bwd_rows(dxn * gpre, norm_x, r_x, C)
    dx_ref[0] = (gf + dxln).astype(dx_ref.dtype)
    dwqkv_c = jax.lax.dot_general(xn, dqkv, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dgpre_c = jnp.sum(dxn * norm_x, axis=0, keepdims=True)

    @pl.when(c == 0)
    def _init():
        dwqkv_ref[0] = dwqkv_c
        dgpre_ref[0] = dgpre_c

    @pl.when(c != 0)
    def _acc():
        dwqkv_ref[0] += dwqkv_c
        dgpre_ref[0] += dgpre_c


def _kernel_bwd2_v5(x_ref, g_ref, gpre_ref, wqkv_ref, w_ref, wout_ref,
                    bout_ref, gout_ref, dctx_ref, ds_ref, m_ref,
                    dx_ref, dwqkv_ref, dgpre_ref, *, C):
    """Backward pass 2 (self-contained recompute variant)."""
    wq = wqkv_ref[:, :HID]
    (norm_x, r_x, xn, q_soft, q_soft_b, attn_b, norm_y, gf, dy, dy_b,
     dattn, ones_bd) = _recompute_to_dy(x_ref, g_ref, gpre_ref, wq,
                                        w_ref, wout_ref, bout_ref, gout_ref,
                                        C)
    _bwd2_tail(gpre_ref, wqkv_ref, w_ref, dctx_ref, ds_ref, m_ref,
               dx_ref, dwqkv_ref, dgpre_ref,
               norm_x, r_x, xn, q_soft, gf, dattn, ones_bd, C)


def _kernel_bwd2_v5_dy(x_ref, g_ref, gpre_ref, wqkv_ref, w_ref, wout_ref,
                       dctx_ref, ds_ref, m_ref, dy_ref,
                       dx_ref, dwqkv_ref, dgpre_ref, *, C):
    """Backward pass 2, dy-spill variant: pass 1 already spilled dy_b, so the
    postnorm-side recompute (attn·W, y, postnorm LN forward+backward — the
    self-contained variant's largest dots) is skipped and only the input side
    is rebuilt.  Bit-identical to _kernel_bwd2_v5: that kernel consumes dy
    only through the same bf16 cast."""
    wq = wqkv_ref[:, :HID]
    norm_x, r_x, xn, q_soft, q_soft_b, ones_bd = _recompute_x_side(
        x_ref, gpre_ref, wq, C)
    gf = g_ref[0].astype(jnp.float32)
    dattn = jax.lax.dot_general(dy_ref[0], wout_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    _bwd2_tail(gpre_ref, wqkv_ref, w_ref, dctx_ref, ds_ref, m_ref,
               dx_ref, dwqkv_ref, dgpre_ref,
               norm_x, r_x, xn, q_soft, gf, dattn, ones_bd, C)


@functools.partial(jax.jit, static_argnames=("interpret", "spill_dy"))
def attn_wrap_v5_bwd_pallas(x, g_pre, w_qkv, w_out, b_out, g_out,
                            ctx, s, m, g, interpret: bool = False,
                            spill_dy: bool = False):
    """Pallas two-pass VJP of the v5 wrap (same math as _wrap_v5_bwd_manual,
    see its derivation).  Every n-sized intermediate stays chunk-local in
    VMEM — the manual XLA backward is HBM-bound on its (B,n,HID) f32
    streams (~17 ms per L0 site at B16/256², profiled)."""
    B, n, C = x.shape
    # chunk-local VMEM demand scales with chunk·C: at C=512 the bwd-2
    # recompute's (chunk, C) f32 intermediates overflow the 16 MiB
    # scoped-vmem stack at chunk=1024 (compile-time OOM on v5e, hit at the
    # context-free trainer's up3 site, B16/n1024/C512 — reachable whenever
    # image context is off so level 3 runs LinearAttention instead of a
    # SpatialTransformer).  Halving the chunk halves the stack; the resident
    # per-batch accumulator outputs are unaffected.  The wrap gate requires
    # n % 1024 == 0, so n % 512 always holds.
    chunk = 1024 if C <= 256 else 512
    assert n % chunk == 0, (n, chunk)
    nchunks = n // chunk
    gpre2 = g_pre.reshape(1, C)
    bout2 = b_out.reshape(1, C)
    gout2 = g_out.reshape(1, C)
    d_ids = jnp.arange(HID) // DIM_HEAD
    mask = (d_ids[:, None] == d_ids[None, :]).astype(jnp.float32)
    rowscale = (DIM_HEAD ** -0.5) / (s.reshape(B, HID, 1) * n)
    w = (ctx * mask * rowscale).astype(jnp.bfloat16)

    xspec = pl.BlockSpec((1, chunk, C), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM)
    cspec = lambda shape: pl.BlockSpec(shape, lambda b, c: (0, 0),
                                       memory_space=pltpu.VMEM)
    bspec = lambda shape: pl.BlockSpec(shape, lambda b, c: (b, 0, 0),
                                       memory_space=pltpu.VMEM)

    out1_specs = [bspec((1, HID, HID)), bspec((1, HID, C)),
                  bspec((1, 1, C)), bspec((1, 1, C))]
    out1_shape = [jax.ShapeDtypeStruct((B, HID, HID), jnp.float32),
                  jax.ShapeDtypeStruct((B, HID, C), jnp.float32),
                  jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
                  jax.ShapeDtypeStruct((B, 1, C), jnp.float32)]
    if spill_dy:
        out1_specs.append(xspec)
        out1_shape.append(jax.ShapeDtypeStruct((B, n, C), jnp.bfloat16))
    out1 = pl.pallas_call(
        functools.partial(_kernel_bwd1_v5, C=C),
        grid=(B, nchunks),
        in_specs=[xspec, xspec, cspec((1, C)), cspec((C, HID)),
                  bspec((1, HID, HID)), cspec((HID, C)), cspec((1, C)),
                  cspec((1, C))],
        out_specs=out1_specs,
        out_shape=out1_shape,
        interpret=interpret,
    )(x, g, gpre2, w_qkv[:, :HID], w, w_out, bout2, gout2)
    dW, dwout_p, dgout_p, dbout_p = out1[:4]

    dctx = dW * mask * rowscale                          # (B, HID, HID) f32
    ds = -(jnp.sum(dctx * ctx, axis=2) / s.reshape(B, HID)).reshape(B, 1, HID)

    if spill_dy:
        dx, dwqkv_p, dgpre_p = pl.pallas_call(
            functools.partial(_kernel_bwd2_v5_dy, C=C),
            grid=(B, nchunks),
            in_specs=[xspec, xspec, cspec((1, C)), cspec((C, 3 * HID)),
                      bspec((1, HID, HID)), cspec((HID, C)),
                      bspec((1, HID, HID)), bspec((1, 1, HID)),
                      bspec((1, 1, HID)), xspec],
            out_specs=[xspec, bspec((1, C, 3 * HID)), bspec((1, 1, C))],
            out_shape=[jax.ShapeDtypeStruct((B, n, C), x.dtype),
                       jax.ShapeDtypeStruct((B, C, 3 * HID), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1, C), jnp.float32)],
            interpret=interpret,
        )(x, g, gpre2, w_qkv, w, w_out,
          dctx.astype(jnp.bfloat16), ds, m, out1[4])
    else:
        dx, dwqkv_p, dgpre_p = pl.pallas_call(
            functools.partial(_kernel_bwd2_v5, C=C),
            grid=(B, nchunks),
            in_specs=[xspec, xspec, cspec((1, C)), cspec((C, 3 * HID)),
                      bspec((1, HID, HID)), cspec((HID, C)), cspec((1, C)),
                      cspec((1, C)), bspec((1, HID, HID)), bspec((1, 1, HID)),
                      bspec((1, 1, HID))],
            out_specs=[xspec, bspec((1, C, 3 * HID)), bspec((1, 1, C))],
            out_shape=[jax.ShapeDtypeStruct((B, n, C), x.dtype),
                       jax.ShapeDtypeStruct((B, C, 3 * HID), jnp.float32),
                       jax.ShapeDtypeStruct((B, 1, C), jnp.float32)],
            interpret=interpret,
        )(x, g, gpre2, w_qkv, w, w_out, bout2, gout2,
          dctx.astype(jnp.bfloat16), ds, m)

    return (dx,
            jnp.sum(dgpre_p, axis=0).reshape(C).astype(g_pre.dtype),
            jnp.sum(dwqkv_p, axis=0).astype(w_qkv.dtype),
            jnp.sum(dwout_p, axis=0).astype(w_out.dtype),
            jnp.sum(dbout_p, axis=(0, 1)).astype(b_out.dtype),
            jnp.sum(dgout_p, axis=(0, 1)).astype(g_out.dtype))


def _wrap_v5_bwd(res, g):
    from daclip_tpu import flags

    x, g_pre, w_qkv, w_out, b_out, g_out, ctx, s, m = res
    B, n, C = x.shape
    if (n % 1024 == 0 and x.dtype == jnp.bfloat16
            and jax.default_backend() != "cpu" and flags.V5_PALLAS_BWD):
        return attn_wrap_v5_bwd_pallas(x, g_pre, w_qkv, w_out, b_out, g_out,
                                       ctx, s, m, g,
                                       spill_dy=flags.V5_DY_SPILL)
    if flags.V5_MANUAL_BWD:
        # recompute-inside-vjp stays off the peak the same way checkpoint did:
        # everything here is consumed within this backward segment
        return _wrap_v5_bwd_manual((x, g_pre, w_qkv, w_out, b_out, g_out), g)
    _, vjp = jax.vjp(jax.checkpoint(_attn_wrap_composition_reference),
                     x, g_pre, w_qkv, w_out, b_out, g_out)
    return vjp(g)


attn_wrap_fused_v5.defvjp(_wrap_v5_fwd, _wrap_v5_bwd)


def linear_attention_reference(qkv: jnp.ndarray, heads: int = HEADS,
                               dim_head: int = DIM_HEAD,
                               dtype=None) -> jnp.ndarray:
    """jnp implementation of the same math — the UNet's LinearAttention body
    calls this directly (single source of truth; golden-tested vs the torch
    reference through tests/parity/test_unet_parity.py).

    Bandwidth-lean: big (n-sized) tensors stay in the input dtype and stream
    once per use; the k-softmax normalisation and 1/n fold into the per-head
    context; both contractions run at full heads·dim_head width with the
    cross-head blocks masked (exactly softmax(q,d)·scale ∘ [softmax(k,n)@(v/n)],
    module_util.py:157-185)."""
    B, n, _ = qkv.shape
    hid = heads * dim_head
    dtype = dtype or qkv.dtype
    q, k, v = qkv[..., :hid], qkv[..., hid:2 * hid], qkv[..., 2 * hid:]
    qh = q.reshape(B, n, heads, dim_head).astype(jnp.float32)
    q_soft = jax.nn.softmax(qh, axis=-1).reshape(B, n, hid).astype(dtype)
    k_max = jnp.max(k, axis=1, keepdims=True).astype(jnp.float32)
    k_exp = jnp.exp(k.astype(jnp.float32) - k_max).astype(dtype)
    k_sum = jnp.sum(k_exp, axis=1, dtype=jnp.float32)    # (B, hid)
    ctx = jnp.einsum("bnx,bny->bxy", k_exp, v.astype(dtype)).astype(jnp.float32)
    d_ids = jnp.arange(hid) // dim_head
    mask = (d_ids[:, None] == d_ids[None, :]).astype(jnp.float32)
    w = (ctx * mask * ((dim_head ** -0.5) / (k_sum[..., None] * n))).astype(dtype)
    return jnp.einsum("bnx,bxy->bny", q_soft, w)


def _fused_composition_reference(xn, w_qkv, w_out, b_out, g_out):
    """XLA composition equal to the fused kernel (used for the backward pass)."""
    B, n, C = xn.shape
    qkv = jnp.einsum("bnc,cd->bnd", xn, w_qkv)
    attn = linear_attention_reference(qkv)
    y = jnp.einsum("bnh,hc->bnc", attn, w_out) + b_out
    yf = y.astype(jnp.float32)
    mu = yf.mean(-1, keepdims=True)
    var = ((yf - mu) ** 2).mean(-1, keepdims=True)
    out = (yf - mu) * jax.lax.rsqrt(var + 1e-5) * g_out.astype(jnp.float32)
    return out.astype(xn.dtype)


@jax.custom_vjp
def linear_attention_fused(xn, w_qkv, w_out, b_out, g_out):
    """Differentiable wrapper: Pallas forward (v4 split kernels — bit-identical
    to the two-phase v2 and ~8% faster: no redundant phase-0 output writes),
    XLA-reference backward (pallas kernels have no autodiff; the backward
    recomputes the reference composition and takes its VJP — the standard
    fused-kernel training pattern)."""
    return linear_attention_fused_v4(xn, w_qkv, w_out, b_out, g_out)


def _fused_fwd(xn, w_qkv, w_out, b_out, g_out):
    out = linear_attention_fused_v4(xn, w_qkv, w_out, b_out, g_out)
    return out, (xn, w_qkv, w_out, b_out, g_out)


def _fused_bwd(res, g):
    # jax.checkpoint keeps the recomputed composition's intermediates from
    # dominating peak HBM (the transient otherwise OOMs 256²/B16 training)
    _, vjp = jax.vjp(jax.checkpoint(_fused_composition_reference), *res)
    return vjp(g)


linear_attention_fused.defvjp(_fused_fwd, _fused_bwd)


def _attn_wrap_composition_reference(x, g_pre, w_qkv, w_out, b_out, g_out):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    xn = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)
          * g_pre.astype(jnp.float32)).astype(x.dtype)
    return x + _fused_composition_reference(xn, w_qkv, w_out, b_out, g_out)


@jax.custom_vjp
def attn_wrap_fused(x, g_pre, w_qkv, w_out, b_out, g_out):
    """Whole Residual(PreNorm(LinearAttention)) in one Pallas op; Pallas
    forward, XLA-reference backward.

    MEASURED SLOWER than the v2 wiring (159.9 vs 136.4 ms UNet fwd at B32/256²):
    recomputing the prenorm LN in both kernel passes costs more VPU time than
    the saved HBM traffic, since XLA already fuses the prenorm/residual into
    neighbouring ops.  Kept for reference; the UNet uses the v2 path."""
    return linear_attention_fused_pallas(x, w_qkv, w_out, b_out, g_out,
                                         g_pre=g_pre, prenorm_residual=True)


def _wrap_fwd(x, g_pre, w_qkv, w_out, b_out, g_out):
    out = linear_attention_fused_pallas(x, w_qkv, w_out, b_out, g_out,
                                        g_pre=g_pre, prenorm_residual=True)
    return out, (x, g_pre, w_qkv, w_out, b_out, g_out)


def _wrap_bwd(res, g):
    _, vjp = jax.vjp(jax.checkpoint(_attn_wrap_composition_reference), *res)
    return vjp(g)


attn_wrap_fused.defvjp(_wrap_fwd, _wrap_bwd)


def linear_attention_supported(n: int, hidden: int) -> bool:
    return (jax.default_backend() != "cpu" and hidden == HID
            and n % 1024 == 0)
