"""Dev tool: wallclock (+ optional per-op breakdown) of the DA-CLIP train
step at the production fork config (frozen ViT-B-32 CLIP + controller +
predictor, 224², full FCRC loss, bf16) — the ~1060 samples/s/chip
BASELINE.md headline.

Chains N steps in one jit via lax.scan (cache-proof methodology, see
tools/time_forward).

  python -m tools.profile_clip_train [--batch 128] [--chain 5] [--remat]
                                     [--profile] [--top 30]
"""
from __future__ import annotations

import argparse
import tempfile
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from daclip_tpu.data.csv_dataset import build_banks
    from daclip_tpu.factory import create_model
    from daclip_tpu.train.clip_train import (ClipTrainConfig, init_state,
                                             make_train_step,
                                             partition_daclip_params)

    B = args.batch
    model, params = create_model("daclip_ViT-B-32", precision="bf16",
                                 use_predictor=True, remat=args.remat)
    trainable, frozen = partition_daclip_params(params)
    cfg = ClipTrainConfig(variant="fork")
    banks = build_banks()
    banks = (jnp.asarray(banks[0]), jnp.asarray(banks[1]))
    step = make_train_step(model.apply, None, cfg, banks=banks)
    state = init_state(trainable, cfg)

    rng = np.random.RandomState(0)
    batch = {
        "images": jnp.asarray(rng.rand(B, 224, 224, 3), jnp.float32),
        "texts": jnp.asarray(rng.randint(0, 49408, (B, 154)), jnp.int32),
        "deg_type": jnp.asarray(rng.randint(0, 7, (B, 4)), jnp.int32),
        "gt_val": jnp.asarray(rng.rand(B, 4), jnp.float32),
    }

    @jax.jit
    def chained(state, frozen):
        # cache-proofness comes from the evolving optimizer state carried
        # between scanned steps (the batch is deliberately constant)
        def body(st, _):
            st, metrics = step(st, batch, frozen=frozen)
            return st, metrics["total_loss"]
        st, losses = jax.lax.scan(body, state, None, length=args.chain)
        return st, losses

    t0 = time.time()
    st, losses = chained(state, frozen)
    jax.block_until_ready(st)
    print(f"compile+first: {time.time() - t0:.1f}s  loss={losses[-1]:.4f}")
    for _ in range(args.reps):
        t0 = time.time()
        st, _ = chained(st, frozen)
        jax.block_until_ready(st)
        dt = (time.time() - t0) / args.chain
        print(f"{dt * 1e3:.1f} ms/step   ({B / dt:.1f} samples/s)")

    if args.profile:
        from tools.profile_forward import summarize
        trace_dir = tempfile.mkdtemp(prefix="daclip_clip_prof_")
        with jax.profiler.trace(trace_dir):
            st, _ = chained(st, frozen)
            jax.block_until_ready(st)
        print(f"trace: {trace_dir}")
        summarize(trace_dir, args.chain, args.top)


if __name__ == "__main__":
    main()
