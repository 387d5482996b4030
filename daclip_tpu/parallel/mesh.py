"""Device mesh + sharding helpers — the TPU-native replacement for the reference's
NCCL/DDP/SLURM plumbing (da-clip/src/training/distributed.py, SURVEY.md §2.4).

Design: a 2-D logical mesh ('data', 'fsdp').
  * 'data'  — batch sharding (pure DP; the reference only ever does DP).
  * 'fsdp'  — optional ZeRO-style parameter sharding: each large parameter is
    sharded along its largest divisible axis; XLA all-gathers it on use and
    reduce-scatters the gradient (free win of the mesh design, off by default).

Everything rides ICI inside a slice; multi-host init is `jax.distributed` via
`initialize_distributed()` (env-driven, the analogue of distributed.py:43-114).
Gradient averaging is implicit: batch-sharded inputs + mean loss under jit make
GSPMD insert the reduction — no explicit all-reduce anywhere.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed():
    """Multi-host init (no-op single-host). Env-driven like the reference's
    RANK/WORLD_SIZE discovery (distributed.py:43-60) but via JAX coordinator.

    On multi-host TPU pods the argument-free `jax.distributed.initialize()`
    discovers the topology from the TPU metadata; gate on the pod-only env
    markers so a single dev chip doesn't block on a coordinator."""
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    elif (os.environ.get("TPU_WORKER_HOSTNAMES")
          or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
        try:
            jax.distributed.initialize()
        except Exception as e:  # noqa: BLE001 — fall back to single-host
            import logging
            logging.getLogger(__name__).warning(
                "jax.distributed.initialize() failed (%s); continuing "
                "single-host", e)


def make_mesh(data: int = -1, fsdp: int = 1, devices=None) -> Mesh:
    """Create a ('data', 'fsdp') mesh.  data=-1 → all remaining devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % fsdp == 0, (n, fsdp)
        data = n // fsdp
    assert data * fsdp == n, f"mesh {data}x{fsdp} != {n} devices"
    return Mesh(devices.reshape(data, fsdp), ("data", "fsdp"))


def mesh_from_spec(spec: Optional[str], batch_size: int, devices=None):
    """CLI `--mesh 'data[,fsdp[,model]]'` → (Mesh, (data, fsdp, model)).
    No spec → the largest 1-D data mesh dividing the batch (reference scope:
    multi_train.sh's torchrun world size, mapped onto explicit mesh axes)."""
    if not spec:
        mesh = make_mesh_for_batch(batch_size, devices=devices)
        return mesh, (mesh.shape["data"], 1, 1)
    dims = [int(x) for x in str(spec).split(",")]
    data, fsdp, model = (dims + [1, 1])[:3]
    if model > 1:
        return (make_mesh_tp(data, fsdp, model, devices=devices),
                (data, fsdp, model))
    return make_mesh(data, fsdp, devices=devices), (data, fsdp, 1)


def make_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """1-D data mesh using the largest device count that divides batch_size
    (keeps tiny smoke batches runnable on many-device hosts)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    return make_mesh(data=n, fsdp=1, devices=devices[:n])


def shard_batch(mesh: Mesh):
    """NamedSharding for batch pytrees: leading axis over 'data' (and 'fsdp' if
    present, so the full mesh consumes the batch)."""
    axes = ("data",) if mesh.shape["fsdp"] == 1 else (("data", "fsdp"),)
    return NamedSharding(mesh, P(axes[0]))


def replicate_tree(mesh: Mesh):
    return NamedSharding(mesh, P())


def make_mesh_tp(data: int = -1, fsdp: int = 1, model: int = 1,
                 devices=None) -> Mesh:
    """3-D ('data', 'fsdp', 'model') mesh for DP × ZeRO × tensor parallelism.
    TP is an EXTENSION beyond reference parity (the reference is DP-only,
    SURVEY.md §2.4) — a free win of the GSPMD design for scaling the towers."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % (fsdp * model) == 0, (n, fsdp, model)
        data = n // (fsdp * model)
    assert data * fsdp * model == n, f"mesh {data}x{fsdp}x{model} != {n}"
    return Mesh(devices.reshape(data, fsdp, model), ("data", "fsdp", "model"))


# Megatron-style classification of transformer projection params by the name
# of their owning module: column-parallel (shard output features) and
# row-parallel (shard input features).  GSPMD inserts the all-reduce after the
# row-parallel matmul automatically — annotations only, no manual collectives.
_TP_COL = {"in_proj", "c_fc", "q_proj", "k_proj", "v_proj", "ff_geglu",
           "to_q", "to_k", "to_v"}
_TP_ROW = {"out_proj", "c_proj", "ff_out"}


def tp_param_shardings(params, mesh: Mesh, axis: str = "model"):
    """Tensor-parallel NamedShardings for a transformer param tree (works on
    the scanned (L, ...) stacked layout): column-parallel kernels/biases shard
    their last dim, row-parallel kernels shard their second-to-last dim;
    everything else (embeddings, norms, heads) replicates over `axis`."""
    from jax.tree_util import tree_map_with_path

    n = mesh.shape[axis]

    def spec(path, x):
        if n == 1:
            return NamedSharding(mesh, P())
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        parent = names[-2] if len(names) >= 2 else ""
        leaf = names[-1] if names else ""
        s = [None] * x.ndim
        if parent in _TP_COL and x.shape[-1] % n == 0:
            s[-1] = axis
        elif parent in _TP_ROW and leaf == "kernel" and x.ndim >= 2 \
                and x.shape[-2] % n == 0:
            s[-2] = axis
        else:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(*s))

    return tree_map_with_path(spec, params)


def fsdp_param_shardings(params, mesh: Mesh, min_size: int = 2 ** 16):
    """ZeRO-style shardings: shard each parameter ≥min_size along its largest
    axis divisible by the fsdp mesh dim; smaller params replicate."""
    n_fsdp = mesh.shape["fsdp"]

    def spec_for(x):
        if n_fsdp == 1 or x.size < min_size:
            return NamedSharding(mesh, P())
        shape = x.shape
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for ax in order:
            if shape[ax] % n_fsdp == 0:
                spec = [None] * len(shape)
                spec[ax] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)
