"""Pallas TPU flash self-attention for the UNet SpatialTransformer
(attention.py:152-193 math — the `attn1` self-attention path).

At the production config the deepest UNet level runs softmax attention over
N = 1024 tokens × 16 heads × dim_head 32 (models/unet.py:SpatialTransformer).
XLA materializes the (B, H, N, N) float32 logits + softmax in HBM — ≈2.1 GB
per call at B32, making the three SpatialTransformers ~22% of the UNet forward
(measured 10 ms each, utils/stage_profile.py).

Kernel design (measured 2.9 ms vs 7.3 ms XLA for the attention core at
B32/H16/N1024/D32):
  * operands stay in the model's NATIVE packed layout (B, N, heads·dim_head) —
    no (B,H,N,D) transposes, no 32→128 lane padding on the DMA streams,
  * grid (B, N/QC): each step loads a QC-row query block plus the full K/V
    for one batch element (K/V blocks are revisited across the QC steps, so
    Mosaic skips their re-DMA) and statically unrolls over heads,
  * per head: (QC, D)·(N, D)ᵀ logits on the MXU in f32, numerically-stable
    softmax in VMEM, (QC, N)·(N, D) PV matmul, result written straight into
    the head's lane slice of the output block — the attention matrix never
    touches HBM.

Training: jax.custom_vjp with a Pallas FlashAttention-2 backward kernel
(`_bwd_kernel` — softmax rows recomputed per q-block, dK/dV accumulated in
resident f32 VMEM blocks, the (B,H,N,N) matrix never in HBM; measured 6.05 vs
11.99 ms for the full vjp at B16/H16/N1024/D32, −19 ms/train-step overall).
Falls back to the jax.checkpoint'd XLA-reference recompute on CPU /
unsupported shapes / DACLIP_TPU_FLASH_BWD=0.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, out_ref, *, heads, dim_head, scale):
    q = q_ref[0]                                        # (QC, H·D) bf16
    k = k_ref[0]                                        # (N, H·D) bf16
    v = v_ref[0]
    for h in range(heads):                              # static unroll
        s = h * dim_head
        qh = jax.lax.slice(q, (0, s), (q.shape[0], s + dim_head))
        kh = jax.lax.slice(k, (0, s), (k.shape[0], s + dim_head))
        vh = jax.lax.slice(v, (0, s), (v.shape[0], s + dim_head))
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        ssum = jnp.sum(p, axis=-1, keepdims=True)
        p = (p / ssum).astype(vh.dtype)
        oh = jax.lax.dot_general(p, vh, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        out_ref[0, :, s: s + dim_head] = oh.astype(out_ref.dtype)


def _pick_qc(N: int) -> int:
    for qc in (512, 256, 128, 64, 32, 16, 8):
        if N % qc == 0:
            return qc
    return N


@functools.partial(jax.jit, static_argnames=("heads", "dim_head", "interpret"))
def flash_self_attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                                heads: int, dim_head: int,
                                interpret: bool = False) -> jnp.ndarray:
    """q/k/v (B, N, heads·dim_head) → (B, N, heads·dim_head);
    per-head softmax(q·kᵀ/√D)·v, non-causal."""
    B, N, HD = q.shape
    assert HD == heads * dim_head, (HD, heads, dim_head)
    qc = _pick_qc(N)
    qspec = pl.BlockSpec((1, qc, HD), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, N, HD), lambda b, c: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, dim_head=dim_head,
                          scale=dim_head ** -0.5),
        grid=(B, N // qc),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((B, N, HD), q.dtype),
        interpret=interpret,
    )(q, k, v)


def _reference(q, k, v, heads, dim_head):
    """XLA composition with identical semantics (backward + fallback).
    Matches models/unet.py:CrossAttention's self-attention arithmetic."""
    B, N, HD = q.shape
    qh = q.reshape(B, N, heads, dim_head)
    kh = k.reshape(B, N, heads, dim_head)
    vh = v.reshape(B, N, heads, dim_head)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
    attn = jax.nn.softmax(logits * (dim_head ** -0.5), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(q.dtype), vh)
    return out.reshape(B, N, HD)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dsum_ref,
                dq_ref, dk_ref, dv_ref, *, heads, dim_head, scale):
    """One (batch, q-block) step of the FlashAttention-2 backward, heads
    statically unrolled (like the forward kernel — lane slices must be
    static for Mosaic).

    Grid (B, N/QC): the dk/dv blocks (indexed by b only) stay resident in
    VMEM across the q-block loop and accumulate in f32; dq is written once
    per (b, qb)."""
    qb = pl.program_id(1)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    dsum = dsum_ref[0]                                     # (QC, heads) f32
    for h in range(heads):                                 # static unroll
        s = h * dim_head
        qh = jax.lax.slice(q, (0, s), (q.shape[0], s + dim_head))
        kh = jax.lax.slice(k, (0, s), (k.shape[0], s + dim_head))
        vh = jax.lax.slice(v, (0, s), (v.shape[0], s + dim_head))
        doh = jax.lax.slice(do, (0, s), (do.shape[0], s + dim_head))
        # recompute the softmax rows exactly like the forward kernel
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        ssum = jnp.sum(p, axis=-1, keepdims=True)
        prob = p / ssum                                    # (QC, N) f32
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dcol = jax.lax.slice(dsum, (0, h), (dsum.shape[0], h + 1))
        ds = (prob * (dp - dcol) * scale).astype(q.dtype)  # (QC, N) bf16
        prob_b = prob.astype(q.dtype)
        dqh = jax.lax.dot_general(ds, kh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dq_ref[0, :, s: s + dim_head] = dqh.astype(dq_ref.dtype)
        dkh = jax.lax.dot_general(ds, qh, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dvh = jax.lax.dot_general(prob_b, doh, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        @pl.when(qb == 0)
        def _init():
            dk_ref[0, :, s: s + dim_head] = dkh
            dv_ref[0, :, s: s + dim_head] = dvh

        @pl.when(qb != 0)
        def _acc():
            dk_ref[0, :, s: s + dim_head] += dkh
            dv_ref[0, :, s: s + dim_head] += dvh


def _bwd_vmem(N: int, HD: int, qc: int, db: bool) -> int:
    """Scoped-VMEM estimate: resident k/v bf16 + dk/dv f32 slabs, q/do/dq
    blocks, per-head (QC,N) transients.  `db` double-counts the resident
    slabs: Mosaic single-buffers the constant-index k/v/dk/dv blocks at
    B ≤ 16 (measured: the HD=512 single call compiles and beats the split
    196 vs 214 ms/train-step) but double-buffers them at larger batches
    (B=24: 16.43M/16M, B=32: 19.75M/16M compile failures observed)."""
    resident = 2 * N * HD * 2 + 2 * N * HD * 4
    return ((2 * resident if db else resident) + 3 * qc * HD * 2
            + 3 * qc * N * 4 + 2 * qc * N * 2)


_BWD_VMEM_BUDGET = 13 * 1024 * 1024
# the db estimate undercounts Mosaic's fixed overhead by ~4M (measured
# 16.55M real vs 12.6M estimated at B24/HD512/qc32) — use a tighter budget
_BWD_VMEM_BUDGET_DB = 11 * 1024 * 1024


def _pick_qc_bwd(N: int, HD: int, B: int = 16) -> int:
    db = B > 16
    budget = _BWD_VMEM_BUDGET_DB if db else _BWD_VMEM_BUDGET
    for qc in (256, 128, 64, 32, 16, 8):
        if N % qc == 0 and _bwd_vmem(N, HD, qc, db=db) <= budget:
            return qc
    return 0


def _head_groups(N: int, HD: int, heads: int, B: int) -> int:
    """Smallest head-group count whose per-group kernel fits VMEM
    (1 = single call); 0 when no split works."""
    for groups in range(1, heads + 1):
        if heads % groups == 0 and _pick_qc_bwd(N, HD // groups, B):
            return groups
    return 0


def flash_bwd_supported(N: int, HD: int, heads: int, B: int = 16) -> bool:
    """True when either the single-call kernel or a head-group split fits."""
    return _head_groups(N, HD, heads, B) > 0


@functools.partial(jax.jit, static_argnames=("heads", "dim_head", "interpret"))
def flash_self_attention_bwd_pallas(q, k, v, do, dsum, heads, dim_head,
                                    interpret=False):
    """dq/dk/dv for per-head softmax(q·kᵀ·scale)·v given dO and
    dsum = rowsum(dO ∘ O) per head (B, N, heads) f32.

    When the whole-HD kernel would exceed scoped VMEM (the resident K/V +
    f32 dK/dV blocks dominate), heads are split into lane-sliced groups and
    the kernel runs once per group — the (N,HD) slabs shrink proportionally
    while the per-head transients are unchanged."""
    B, N, HD = q.shape
    groups = _head_groups(N, HD, heads, B)
    if groups == 0:
        raise ValueError(f"no head split fits VMEM for N={N} HD={HD}")
    qc = _pick_qc_bwd(N, HD, B) if groups == 1 else 0
    if groups > 1:
        hg, hd_g = heads // groups, HD // groups
        parts = [
            flash_self_attention_bwd_pallas(
                q[..., i * hd_g:(i + 1) * hd_g],
                k[..., i * hd_g:(i + 1) * hd_g],
                v[..., i * hd_g:(i + 1) * hd_g],
                do[..., i * hd_g:(i + 1) * hd_g],
                dsum[..., i * hg:(i + 1) * hg],
                hg, dim_head, interpret=interpret)
            for i in range(groups)]
        return tuple(jnp.concatenate([p[j] for p in parts], axis=-1)
                     for j in range(3))
    qspec = pl.BlockSpec((1, qc, HD), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, N, HD), lambda b, c: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, qc, dsum.shape[-1]), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, dim_head=dim_head,
                          scale=dim_head ** -0.5),
        grid=(B, N // qc),
        in_specs=[qspec, kvspec, kvspec, qspec, dspec],
        out_specs=[qspec, kvspec, kvspec],
        out_shape=[jax.ShapeDtypeStruct((B, N, HD), q.dtype),
                   jax.ShapeDtypeStruct((B, N, HD), jnp.float32),
                   jax.ShapeDtypeStruct((B, N, HD), jnp.float32)],
        interpret=interpret,
    )(q, k, v, do, dsum)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_self_attention(q, k, v, heads, dim_head):
    return flash_self_attention_pallas(q, k, v, heads, dim_head)


def _use_pallas_bwd(B, N, HD, heads):
    from daclip_tpu import flags

    return (flash_bwd_supported(N, HD, heads, B)
            and flags.FLASH_BWD
            and jax.default_backend() != "cpu")


def _fwd(q, k, v, heads, dim_head):
    out = flash_self_attention_pallas(q, k, v, heads, dim_head)
    B, N, HD = q.shape
    # the forward output is only needed by the Pallas backward (for dsum);
    # don't hold an extra (B,N,HD) activation across fwd->bwd when the
    # XLA-recompute fallback will run instead
    keep = out if _use_pallas_bwd(B, N, HD, heads) else None
    return out, (q, k, v, keep)


def _bwd(heads, dim_head, res, g):
    q, k, v, out = res
    B, N, HD = q.shape
    if out is not None and _use_pallas_bwd(B, N, HD, heads):
        # Pallas backward: the (B,H,N,N) softmax matrix never hits HBM.  The
        # previous XLA-reference recompute materialized it (bf16[16,16,1024,
        # 1024] loop fusions + softmax-backward chains, ~14 ms/train-step at
        # the two deep SpatialTransformer sites — tools/profile_train).
        dsum = jnp.einsum(
            "bnhd,bnhd->bnh",
            g.reshape(B, N, heads, dim_head).astype(jnp.float32),
            out.reshape(B, N, heads, dim_head).astype(jnp.float32))
        return flash_self_attention_bwd_pallas(q, k, v, g, dsum, heads,
                                               dim_head)
    f = functools.partial(_reference, heads=heads, dim_head=dim_head)
    _, vjp = jax.vjp(jax.checkpoint(f), q, k, v)
    return vjp(g)


flash_self_attention.defvjp(_fwd, _bwd)


def flash_attention_supported(B: int, heads: int, N: int, dim_head: int) -> bool:
    """VMEM budget: q/out blocks (2·QC·HD·2B) + K/V blocks (2·N·HD·2B, double
    buffered) + per-head logits/softmax transients (2·QC·N·4B) must stay well
    under the 16 MB scoped limit."""
    if jax.default_backend() == "cpu":
        return False
    if N % 8 or dim_head % 8 or dim_head > 128:
        return False
    HD = heads * dim_head
    qc = _pick_qc(N)
    vmem = (2 * (2 * qc * HD * 2) + 2 * (2 * N * HD * 2)
            + 2 * qc * N * 4 + qc * max(HD, 128) * 4)
    return vmem <= 12 * 1024 * 1024
