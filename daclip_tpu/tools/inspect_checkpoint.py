"""Checkpoint inspection CLI — key/shape dump for any supported format.

Parity: the reference ships a tiny debug script that torch.loads a checkpoint
and prints its top-level keys plus every state_dict key
(da-clip/src/test.py:1-11). This is the framework-wide equivalent: it walks a
torch `.pt` (lazy torch import), an orbax train dir (as written by either
train CLI), a single orbax step dir, or a portable flat `.npz`, printing the
top-level layout and the flattened parameter keys with shapes/dtypes and a
total parameter count. Native formats need no torch on the host.

  python -m daclip_tpu.tools.inspect_checkpoint <ckpt> [--keys-only] [--limit N]
"""
from __future__ import annotations

import argparse
from typing import Any, Dict, Iterator, Tuple

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Iterator[Tuple[str, Any]]:
    if isinstance(tree, dict):
        for k in sorted(tree, key=str):
            yield from _flatten(tree[k], f"{prefix}.{k}" if prefix else str(k))
    else:
        yield prefix, tree


def _leaf_desc(v: Any) -> str:
    shape = getattr(v, "shape", None)
    if shape is not None:
        dtype = getattr(v, "dtype", "?")
        return f"{tuple(shape)} {dtype}"
    return repr(v)


def load_tree(path: str, step=None) -> Tuple[Dict, str]:
    """Returns (tree, format_name). Torch import only for .pt/.pth files."""
    from daclip_tpu.utils import native_checkpoint as nc

    kind = nc.checkpoint_kind(path)
    if kind in ("orbax", "orbax_step"):
        tree, restored = nc.load_train_tree(path, step=step)
        return tree, f"orbax (step {restored})"
    if kind == "npz":
        return nc.load_params_npz(path), "npz"
    from daclip_tpu.utils.torch_convert import load_torch_state_dict
    return load_torch_state_dict(path), "torch"


def describe(tree: Dict, fmt: str, keys_only: bool = False, limit: int = 0,
             _print=print) -> Dict[str, int]:
    _print(f"format: {fmt}")
    if isinstance(tree, dict):
        _print(f"top-level keys: {sorted(tree, key=str)}")
    n_leaves = 0
    n_params = 0
    for i, (key, leaf) in enumerate(_flatten(tree)):
        n_leaves += 1
        size = int(np.prod(getattr(leaf, "shape", ()) or ())) \
            if hasattr(leaf, "shape") else 0
        n_params += size
        if limit and i >= limit:
            continue
        _print(key if keys_only else f"{key}  {_leaf_desc(leaf)}")
    if limit and n_leaves > limit:
        _print(f"... ({n_leaves - limit} more)")
    _print(f"{n_leaves} leaves, {n_params / 1e6:.2f}M array elements")
    return {"leaves": n_leaves, "elements": n_params}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("checkpoint",
                    help="torch .pt/.pth, orbax train dir, orbax step dir, or .npz")
    ap.add_argument("--step", type=int, default=None,
                    help="orbax step to load (default: latest)")
    ap.add_argument("--keys-only", action="store_true",
                    help="print keys without shapes (reference test.py format)")
    ap.add_argument("--limit", type=int, default=0,
                    help="print at most N leaves (0 = all)")
    args = ap.parse_args(argv)
    tree, fmt = load_tree(args.checkpoint, step=args.step)
    describe(tree, fmt, keys_only=args.keys_only, limit=args.limit)


if __name__ == "__main__":
    main()
