"""Test config: force an 8-device virtual CPU mesh (the TPU analogue of multi-node
testing without a cluster — SURVEY.md §4).  Must run before jax is imported."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pathlib
import sys

# Full-suite runs have twice segfaulted inside XLA:CPU's LLVM compile of the
# biggest graph (the restoration train step, tests/test_train.py) after ~230
# green tests — the classic signature of deep-recursion stack overflow on the
# default 8 MiB main-thread stack.  The main stack grows on demand up to the
# soft limit, so raise it before any compiles happen (hard limit is unlimited
# here; keep a finite cap to avoid surprising the allocator).
import resource

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 * 1024 * 1024
if _soft != resource.RLIM_INFINITY and _soft < _want:
    try:
        resource.setrlimit(resource.RLIMIT_STACK,
                           (_want if _hard == resource.RLIM_INFINITY
                            else min(_want, _hard), _hard))
    except (ValueError, OSError):
        pass

import jax
import pytest

# Parity tests compare float32 activations against torch; JAX's default matmul /
# conv precision is reduced (bf16 passes) even on CPU, so force full f32 here.
# Production code keeps the fast default (bf16 on the MXU).
jax.config.update("jax_default_matmul_precision", "highest")
# The env vars alone are not enough on hosts where a site config injects an
# accelerator plugin into jax_platforms; force the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")
sys.path.insert(0, str(REPO))


@pytest.fixture(autouse=True, scope="module")
def _release_jax_executables_per_module():
    """Full-suite runs (and only full-suite runs) have repeatedly segfaulted
    inside XLA:CPU's LLVM compile at a *tiny* graph ~230 tests in, while every
    module subset — including the crashing module alone and each half of the
    suite — is green: the signature of cumulative per-process JIT state (live
    compiled executables / code pages across hundreds of compiles), not of any
    one test.  The RLIMIT_STACK raise above did not help (the stack reservation
    is fixed at exec time), so cap the accumulation instead: drop every live
    jitted executable at each module boundary.  Cross-module cache reuse is
    ~nil (each module builds its own tiny models), so this costs nothing.
    """
    yield
    import gc

    jax.clear_caches()
    gc.collect()

requires_reference = pytest.mark.skipif(
    not REFERENCE.exists(),
    reason="upstream reference checkout not available (parity tests are dev-only)",
)
