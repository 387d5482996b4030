"""Dev tool: honest full-forward wallclock for the flagship UNet.

Chains N forwards inside ONE jit via lax.fori_loop (output fed back to input)
so the axon tunnel's result cache can't fake the timing (benchmark methodology
in .claude memory).  This is the ONLY measurement that decides kernel-wiring
questions — isolated microbenches invert (see ops/conv3x3.py history).

  python -m tools.time_forward [--batch 32] [--size 256] [--chain 20]
"""
from __future__ import annotations

import argparse
import functools
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chain", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--wild-ir", action="store_true")
    ap.add_argument("--vmem-kib", type=int, default=0,
                    help="xla_tpu_scoped_vmem_limit_kib compiler option")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from daclip_tpu.models.unet import ConditionalUNet

    B, S = args.batch, args.size
    if args.wild_ir:
        net = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 4), context_dim=768,
                              use_degra_context=True, use_image_context=True,
                              scale=0.5, dtype=jnp.bfloat16)
        D = 768
    else:
        net = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 8), context_dim=512,
                              use_degra_context=True, use_image_context=True,
                              dtype=jnp.bfloat16)
        D = 512
    x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
    ctx = jnp.zeros((B, D), jnp.bfloat16)
    params = jax.eval_shape(lambda k: net.init(k, x, x, 1.0, ctx, ctx),
                            jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: jnp.full(a.shape, 0.01, a.dtype), params)
    tb = jnp.full((B,), 50.0)

    opts = ({"xla_tpu_scoped_vmem_limit_kib": str(args.vmem_kib)}
            if args.vmem_kib else None)

    @functools.partial(jax.jit, compiler_options=opts)
    def chained(p, x0):
        def body(i, x):
            y = net.apply(p, x, x0, tb + i, ctx, ctx)
            return x0 + 0.1 * y.astype(x.dtype)
        return jax.lax.fori_loop(0, args.chain, body, x0)

    t0 = time.time()
    out = jax.block_until_ready(chained(params, x))
    print(f"compile+first: {time.time() - t0:.1f}s")
    for _ in range(args.reps):
        t0 = time.time()
        out = jax.block_until_ready(chained(params, out))
        dt = (time.time() - t0) / args.chain * 1e3
        print(f"{dt:.2f} ms/forward   ({args.batch / dt * 1e3:.1f} img/s "
              f"single-forward equiv)")


if __name__ == "__main__":
    main()
