#!/bin/bash
# Multi-host DA-CLIP training (da-clip/src/multi_train.sh parity).  On TPU the
# reference's torchrun/NCCL plumbing is replaced by jax.distributed: launch
# this same script on every host with COORDINATOR_ADDRESS set (the data mesh
# spans all chips; each host feeds its own stripe of the global batch).
: "${COORDINATOR_ADDRESS:?set COORDINATOR_ADDRESS=<host0>:<port> on every host}"
exec "$(dirname "$0")/single_train.sh" "$@"
