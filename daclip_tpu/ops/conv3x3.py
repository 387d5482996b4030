"""Pallas TPU kernel: 3x3 stride-1 SAME conv, NHWC, bf16 in / bf16 out with f32
accumulation — the UNet's dominant op (ResBlock Blocks, module_util.py:115-129).

Strategy: the conv is 9 shifted (TH·W, C)x(C, O) MXU matmuls accumulated in a
f32 VMEM tile.  The input rides in HBM; each grid step DMAs an overlapping
(TH+2, Wp, C) row strip into VMEM scratch (overlapping windows are not
expressible with BlockSpec index maps), and the dy/dx shifts are slices of the
LOADED VALUE — Mosaic rejects unaligned memref slices and bf16 rotates, but
value slices are legal.  Channels are padded to full 128-lane tiles and strip
width to the 8-sublane tiling (DMA constraints).

STATUS (measured on v5e via axon, chained timing, B16): ties XLA's conv emitter
at C256/64px (44 vs 45 TF/s) and loses at C64/256px (14 vs 24 TF/s — the 64→128
channel padding doubles both MACs and DMA traffic).  `conv3x3_supported`
therefore returns False unless DACLIP_TPU_PALLAS_CONV=1; the kernel is kept as
tested infrastructure for future epilogue-fusion work (scale-shift + SiLU +
residual inside the conv epilogue would remove HBM round trips XLA can't).

Further variants PROTOTYPED AND REJECTED (chained full-size timing vs the
emitter's ~5.0 ms at B32/C64/256²):
  * 576-wide lane-concat im2col — Mosaic rejects concat of slices with
    differing sublane offsets ("offset mismatch on non-concat dimension");
  * dy-concat (192-wide, matching offsets) — compiles, 9.6 ms (relayouts);
  * 3 separately-DMA'd dy strips (aligned concat) — DMA slices need 128-lane
    tiles, C=64 strips are rejected outright;
  * paired-lane layout ((B,H,W/2,2C): two pixels per 128-lane tile, 9 clean
    (·,128)×(128,128) block matmuls, zero relayouts) — correct but 7.4 ms:
    the 2× block-fill FLOP overhead outruns the MXU-utilisation gain.
Conclusion: the conv emitter is the practical floor for these shapes on this
generation; revisit only with a fundamentally different angle (e.g. fused
multi-conv epilogues amortising the DMA, or wider output channels)."""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, out_ref, xt0, sems, *, TH, W, C, O):
    b = pl.program_id(0)
    h = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(h * TH, TH + 2), :, :], xt0, sems.at[0])
    dma.start()
    dma.wait()
    x_all = xt0[:]                                       # (TH+2, Wp, C)
    acc = jnp.zeros((TH, W, O), jnp.float32)
    for dy in range(3):
        xs_row = jax.lax.slice(x_all, (dy, 0, 0), (dy + TH, W + 2, C))
        for dx in range(3):
            window = jax.lax.slice(xs_row, (0, dx, 0), (TH, dx + W, C))
            acc = acc + jax.lax.dot_general(
                window, w_ref[dy, dx], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h",))
def conv3x3_pallas(x: jnp.ndarray, w: jnp.ndarray,
                   tile_h: int = 32) -> jnp.ndarray:
    """x (B,H,W,C) bf16; w (3,3,C,O) — returns (B,H,W,O) bf16, SAME padding."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    assert H % tile_h == 0, (H, tile_h)
    # Mosaic DMA slices require the minor (lane) dim in full 128-tiles: pad C.
    Cp = -(-C // 128) * 128
    if Cp != C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    # DMA'd strip width must be a multiple of the sublane tiling (8)
    Wp = -(-(W + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + Wp - (W + 2)), (0, 0)))
    C = Cp

    grid = (B, H // tile_h)
    return pl.pallas_call(
        functools.partial(_kernel, TH=tile_h, W=W, C=C, O=O),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),       # padded input stays in HBM
            pl.BlockSpec((3, 3, C, O), lambda b, h: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, O),
                               lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, Wp, C), x.dtype),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )(xp, w.astype(x.dtype))


def conv3x3_supported(shape, features: int, tile_h: int = 32) -> bool:
    """Gate: opt-in via DACLIP_TPU_PALLAS_CONV=1 (see STATUS in the module
    docstring), TPU backend, dims aligned, VMEM fits."""
    from daclip_tpu import flags
    if not flags.PALLAS_CONV:
        return False
    if jax.default_backend() == "cpu":
        return False
    B, H, W, C = shape
    if H % tile_h or C % 64 or features % 64:
        return False
    vmem = ((tile_h + 2) * (-(-(W + 2) // 8) * 8) * (-(-C // 128) * 128) * 2
            + tile_h * W * features * 4 + 9 * C * features * 2)
    return vmem < 10 * 1024 * 1024
