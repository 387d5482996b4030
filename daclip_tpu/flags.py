"""Process-level kernel toggles, read from the environment ONCE at import.

Every flag here selects between kernel implementations *inside jit-traced
code*, so its value is a compile-time constant: it is baked into XLA's trace
cache at first trace, and flipping the env var later in the same process
would silently have no effect.  Reading the env exactly once at import makes
that contract explicit — set these before importing daclip_tpu.

Tests toggle paths with `monkeypatch.setattr(flags, "NAME", value)` (and a
fresh, un-jitted call), never by setting the env mid-process.

Defaults encode the measured-winning configuration on v5e (BASELINE.md);
the off-by-default gates are retained mechanisms that lost their A/B.
"""
from __future__ import annotations

import os


def _on(name: str, default: str) -> bool:
    return os.environ.get(name, default) == "1"


# --- ops/conv3x3.py: opt-in Pallas 3x3 conv (lost e2e vs XLA emitter) ---
PALLAS_CONV = _on("DACLIP_TPU_PALLAS_CONV", "0")

# --- ops/linear_attention.py ---
ATTN_PACK = _on("DACLIP_TPU_ATTN_PACK", "0")         # pixel-pair packing, off
V5_PALLAS_BWD = _on("DACLIP_TPU_V5_PALLAS_BWD", "1")  # Pallas bwd kernels
V5_MANUAL_BWD = _on("DACLIP_TPU_V5_MANUAL_BWD", "1")  # manual-vjp fallback
V5_DY_SPILL = _on("DACLIP_TPU_V5_DY_SPILL", "1")      # bwd1 spills dy_b for
#   bwd2 (skips bwd2's postnorm recompute; bit-identical — dy only feeds bwd2
#   through its bf16 cast).  TPU A/B (round 5, tools/profile_train chain 10,
#   B16/256²/remat): 183.7-185.0 ms/step vs 186.9-187.4 off — adopted.

# --- ops/pointwise.py: opt-in fused 1x1 conv (lost e2e) ---
POINTWISE = _on("DACLIP_TPU_POINTWISE", "0")
POINTWISE_MAXO = int(os.environ.get("DACLIP_TPU_POINTWISE_MAXO", str(1 << 30)))

# --- ops/flash_attention.py ---
FLASH_BWD = _on("DACLIP_TPU_FLASH_BWD", "1")

# --- models/unet.py ---
MERGE_RES = _on("DACLIP_TPU_MERGE_RES", "1")      # merged block1+res_conv
BLOCK_BARRIER = os.environ.get("DACLIP_TPU_BLOCK_BARRIER", "1")  # "0"=off,
#   else min spatial size at which the optimization_barrier applies
V5_WRAP = _on("DACLIP_TPU_V5_WRAP", "1")          # fused v5 attention wrap
V3_WRAP = _on("DACLIP_TPU_V3_WRAP", "0")          # retired two-phase wrap
SPLIT_SKIP = _on("DACLIP_TPU_SPLIT_SKIP", "0")    # concat-free skips (lost)
TAP_FINAL = _on("DACLIP_TPU_TAP_FINAL", "1")      # fused final conv
POLY_UP = _on("DACLIP_TPU_POLY_UP", "1")          # polyphase upsample
