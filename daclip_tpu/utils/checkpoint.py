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


# async saves need a LIVE manager (close() joins pending writes); cache one
# per directory and drain them at exit
_live_managers = {}


def _async_manager(directory: str, max_to_keep) -> ocp.CheckpointManager:
    key = (os.path.abspath(directory), max_to_keep)
    if key not in _live_managers:
        _live_managers[key] = _manager(directory, max_to_keep)
    return _live_managers[key]


def wait_all():
    """Join all outstanding async checkpoint writes."""
    for mgr in _live_managers.values():
        mgr.wait_until_finished()


import atexit  # noqa: E402


def _drain_at_exit():
    # orbax close() logs via the root logger; at interpreter shutdown those
    # handlers may wrap already-closed streams (pytest capture) — don't let
    # logging print "Logging error" tracebacks for that
    import logging
    logging.raiseExceptions = False
    for m in _live_managers.values():
        m.wait_until_finished()
        m.close()


atexit.register(_drain_at_exit)


def save_checkpoint(directory: str, step: int, tree: Any,
                    max_to_keep: Optional[int] = None, wait: bool = True):
    """wait=False overlaps serialization with subsequent training steps (the
    orbax async-save flow, training/main.py:454-459's atomic-save analogue).

    ALL saves for a directory go through one cached live manager: a second
    manager over the same directory races the first one's in-flight tmp dirs
    (observed as 'Directory not empty' during its cleanup pass).  wait=True
    drains that manager's queue after submitting."""
    mgr = _async_manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(tree))
    if wait:
        mgr.wait_until_finished()


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
