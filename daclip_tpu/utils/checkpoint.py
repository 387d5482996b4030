"""Orbax checkpointing of {params, opt_state, ema, step} — the TPU-native
replacement for the reference's .pth/.state files (base_model.py:80-131,
training/main.py:426-459).

Layout: <dir>/<step>/ orbax composite; `latest` resolution mirrors the
"resume latest" flow (training/main.py:131-163).  Saves are atomic (orbax writes
to tmp + renames, the analogue of main.py:454-459).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _manager(directory: str, max_to_keep: Optional[int] = None) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_checkpoint(directory: str, step: int, tree: Any,
                    max_to_keep: Optional[int] = None, wait: bool = True):
    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(tree))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       target: Any = None) -> Any:
    """Restore pytree; with `target` given, restores with matching structure and
    shardings/dtypes taken from target's arrays."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    if target is not None:
        restored = mgr.restore(
            step, args=ocp.args.StandardRestore(jax.tree.map(
                ocp.utils.to_shape_dtype_struct
                if hasattr(ocp.utils, "to_shape_dtype_struct") else (lambda x: x),
                target)))
    else:
        restored = mgr.restore(step)
    mgr.close()
    return restored
