"""Dev tool: per-op DEVICE-time breakdown + wallclock of the restoration
TRAIN step (production config: patch 256², B16, bf16, remat — the 60.5
samples/s BASELINE.md headline).

Chains N steps inside one jit via lax.scan over fold_in'd keys (cache-proof,
same methodology as tools/time_forward) and optionally traces it through the
same xplane summary as tools/profile_forward.

  python -m tools.profile_train [--batch 16] [--size 256] [--chain 5]
                                [--no-remat] [--profile] [--top 40]
"""
from __future__ import annotations

import argparse
import tempfile
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chain", type=int, default=5)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--wild-ir", action="store_true")
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from daclip_tpu.models.unet import ConditionalUNet
    from daclip_tpu.sde import IRSDE
    from daclip_tpu.train.restoration import (RestorationTrainConfig,
                                              init_state, make_train_step)

    B, S = args.batch, args.size
    if args.wild_ir:
        net = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 4), context_dim=768,
                              use_degra_context=True, use_image_context=True,
                              scale=0.5, remat=not args.no_remat,
                              dtype=jnp.bfloat16)
        D = 768
    else:
        net = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 8), context_dim=512,
                              use_degra_context=True, use_image_context=True,
                              remat=not args.no_remat, dtype=jnp.bfloat16)
        D = 512
    lq = jnp.zeros((B, S, S, 3), jnp.float32)
    ctx = jnp.zeros((B, D), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), lq, lq, jnp.ones((B,)), ctx, ctx)
    sde = IRSDE(max_sigma=50, T=100, schedule="cosine", eps=0.005)
    cfg = RestorationTrainConfig()
    step = make_train_step(net.apply, sde, cfg)
    state = init_state(params, cfg)

    batch = {"LQ": lq, "GT": lq, "text_context": ctx, "image_context": ctx}

    @jax.jit
    def chained(state, key):
        def body(st, k):
            st, metrics = step(st, batch, k)
            return st, metrics["loss"]
        keys = jax.random.split(key, args.chain)
        st, losses = jax.lax.scan(body, state, keys)
        return st, losses

    t0 = time.time()
    st, _ = chained(state, jax.random.PRNGKey(1))
    jax.block_until_ready(st)
    print(f"compile+first: {time.time() - t0:.1f}s")
    for _ in range(args.reps):
        t0 = time.time()
        st, _ = chained(st, jax.random.PRNGKey(2))
        jax.block_until_ready(st)
        dt = (time.time() - t0) / args.chain
        print(f"{dt * 1e3:.1f} ms/step   ({B / dt:.1f} samples/s)")

    if args.profile:
        from tools.profile_forward import summarize
        trace_dir = tempfile.mkdtemp(prefix="daclip_train_prof_")
        with jax.profiler.trace(trace_dir):
            st, _ = chained(st, jax.random.PRNGKey(3))
            jax.block_until_ready(st)
        print(f"trace: {trace_dir}")
        summarize(trace_dir, args.chain, args.top)


if __name__ == "__main__":
    main()
