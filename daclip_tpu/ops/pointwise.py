"""Pallas TPU kernels for pointwise (1x1) convs on conv-layout tensors.

The ResBlock residual path `res_conv` (module_util.py:150: conv1x1 over the
logical concat(x, skip)) lowers badly in XLA at the shallow UNet levels: the
(B·H·W, C)x(C, O) dot on a conv-layout operand is emitted through the conv
sublane emitter at ~11 TF/s (3.1 ms per call at B32/256²/C64 — profiled).

Key trick: XLA assigns conv outputs the layout {3,0,2,1}, which is bit-identical
to the STANDARD layout of the (H, W, B, C)-transposed shape, so
`jnp.transpose(x, (1, 2, 0, 3))` before a pallas call (and back after) costs
nothing — the kernel streams the rows exactly as the conv wrote them, with no
layout-change copy.  Measured on v5e: 2.7 ms saved per res_conv in a
conv→res_conv→conv chain vs the XLA dot (see git history / BASELINE.md).

STATUS: DEFAULT OFF — the microbench win INVERTED at full-forward level
(the only level that decides wiring, .claude benchmark-methodology memory):
chained B32/256² UNet forward on v5e measured 130.8 ms (all levels) /
130.6 ms (shallow-only, MAXO=128) with this kernel vs 118.9 ms with the
plain XLA dot — in the full graph XLA picks operand layouts that make the
"free" transposes real copies and loses the dot's neighbour fusions.  Same
inversion as v3 whole-wrap fusion and split-skip convs.  Opt in with
DACLIP_TPU_POINTWISE=1.

`dual_conv1x1(x, skip, w)` = x @ w[:Cx] + skip @ w[Cx:]  (the concat-free
split-kernel evaluation, models/unet.py:Conv1x1Pair), differentiable via a
trivial matmul VJP.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _dual_kernel(x_ref, s_ref, w_ref, o_ref, *, Cx):
    w = w_ref[:]
    acc = jax.lax.dot_general(x_ref[:], w[:Cx], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(s_ref[:], w[Cx:], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(o_ref.dtype)


def _single_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


_VMEM_BUDGET = 12 * 2 ** 20  # stay under the 16 MB scoped-vmem limit


def _pick_block(M: int, Cin: int = 64, O: int = 64, itemsize: int = 2) -> int:
    """Largest row-block that divides M AND fits VMEM: double-buffered bf16
    in/out blocks + the f32 MXU accumulator (this is what OOMed at up3 —
    (4096,768)x(768,512) needs 17.8 MB of the 16 MB scoped vmem)."""
    per_row = 2 * Cin * itemsize + 2 * O * itemsize + O * 4
    for blk in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if M % blk == 0 and blk * per_row + 2 * Cin * O * itemsize <= _VMEM_BUDGET:
            return blk
    return 0


def pointwise_supported(x, skip=None, O: int = None) -> bool:
    """TPU only; row count must tile; C lanes must be clean multiples of 8.
    Opt-in via `DACLIP_TPU_POINTWISE=1` (default off — loses e2e, see module
    docstring); `DACLIP_TPU_POINTWISE_MAXO=<n>` restricts to shallow levels
    (out features <= n) where the XLA conv-layout dot pathology lives."""
    from daclip_tpu import flags
    if not flags.POINTWISE:
        return False
    if jax.default_backend() == "cpu":
        return False
    B, H, W, Cx = x.shape
    Cin = Cx + (skip.shape[-1] if skip is not None else 0)
    if O is not None:
        if O > flags.POINTWISE_MAXO:
            return False
    if _pick_block(B * H * W, Cin, O or Cin) < 256:
        return False
    dims = [Cx] + ([skip.shape[-1]] if skip is not None else [])
    return all(c % 8 == 0 for c in dims)


@functools.partial(jax.jit, static_argnames=())
def _dual_conv1x1_fwd_impl(x, skip, w):
    B, H, W, Cx = x.shape
    O = w.shape[-1]
    M = B * H * W
    blk = _pick_block(M, w.shape[0], O, x.dtype.itemsize)
    # conv layout {3,0,2,1} == standard layout of (H, W, B, C): free transpose
    xt = jnp.transpose(x, (1, 2, 0, 3)).reshape(M, Cx)
    grid = (M // blk,)
    if skip is None:
        y = pl.pallas_call(
            _single_kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((blk, Cx), lambda i: (i, 0)),
                      pl.BlockSpec((Cx, O), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((blk, O), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M, O), x.dtype),
        )(xt, w)
    else:
        Cs = skip.shape[-1]
        st = jnp.transpose(skip, (1, 2, 0, 3)).reshape(M, Cs)
        y = pl.pallas_call(
            functools.partial(_dual_kernel, Cx=Cx),
            grid=grid,
            in_specs=[pl.BlockSpec((blk, Cx), lambda i: (i, 0)),
                      pl.BlockSpec((blk, Cs), lambda i: (i, 0)),
                      pl.BlockSpec((Cx + Cs, O), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((blk, O), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((M, O), x.dtype),
        )(xt, st, w)
    return jnp.transpose(y.reshape(H, W, B, O), (2, 0, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def dual_conv1x1(x, skip, w):
    """y[b,h,w,:] = x[b,h,w,:] @ w[:Cx] + skip[b,h,w,:] @ w[Cx:]  (skip may be
    None → plain 1x1).  x/skip (B,H,W,C*) any float dtype; w (Cx[+Cs], O) in
    the compute dtype.  Pallas forward on TPU, matmul VJP backward."""
    return _dual_conv1x1_fwd_impl(x, skip, w)


def _dc_fwd(x, skip, w):
    return _dual_conv1x1_fwd_impl(x, skip, w), (x, skip, w)


def _dc_bwd(res, g):
    x, skip, w = res
    B, H, W, Cx = x.shape
    gf = g.reshape(-1, g.shape[-1])
    dx = jnp.dot(gf, w[:Cx].T).reshape(x.shape).astype(x.dtype)
    if skip is None:
        dw = jnp.dot(x.reshape(-1, Cx).T, gf).astype(w.dtype)
        return dx, None, dw
    Cs = skip.shape[-1]
    ds = jnp.dot(gf, w[Cx:].T).reshape(skip.shape).astype(skip.dtype)
    dw = jnp.concatenate(
        [jnp.dot(x.reshape(-1, Cx).T, gf),
         jnp.dot(skip.reshape(-1, Cs).T, gf)], axis=0).astype(w.dtype)
    return dx, ds, dw


dual_conv1x1.defvjp(_dc_fwd, _dc_bwd)
