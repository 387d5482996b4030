"""Per-stage UNet wallclock breakdown (dev tool): times isolated jitted subgraphs
(level-0 ResBlock, LinearAttention, SpatialTransformer, downsample chain) at the
production 256² config to locate the sampler bottleneck on real hardware.

  python -m daclip_tpu.utils.stage_profile [--batch 4] [--size 256]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args(argv)
    B, S = args.batch, args.size
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from daclip_tpu.models.unet import (AttnWrap, Downsample2x, ResBlock,
                                        Upsample2x)

    results = {}
    key = jax.random.PRNGKey(0)
    t_emb = jnp.ones((B, 256))

    for level, (res, ch) in enumerate([(S, 64), (S // 2, 128), (S // 4, 256),
                                       (S // 8, 512)]):
        x = jnp.ones((B, res, res, ch), dtype)
        rb = ResBlock(ch, dtype=dtype)
        p = rb.init(key, x, t_emb)
        results[f"L{level} resblock {res}px c{ch}"] = timeit(
            jax.jit(lambda xx: rb.apply(p, xx, t_emb)), x)

        spatial = level == 3
        aw = AttnWrap(spatial, heads=ch // 32, context_dim=512, dtype=dtype)
        ctx = jnp.ones((B, 1, 512), dtype)
        pa = aw.init(key, x, ctx if spatial else None)
        results[f"L{level} {'spatial' if spatial else 'linattn'} {res}px c{ch}"] = \
            timeit(jax.jit(lambda xx: aw.apply(pa, xx, ctx if spatial else None)), x)

        if level < 3:
            dn = Downsample2x(ch * 2, dtype=dtype)
            pd = dn.init(key, x)
            results[f"L{level} down4x4 {res}px c{ch}->{ch*2}"] = timeit(
                jax.jit(lambda xx: dn.apply(pd, xx)), x)

    for k, v in results.items():
        print(f"{k:42s} {v:8.3f} ms")
    total_est = (2 * (results.get(f"L0 resblock {S}px c64", 0)) * 2
                 + 2 * results.get(f"L0 linattn {S}px c64", 0))
    print(f"(level-0 pair estimate: {total_est:.2f} ms of the forward)")


if __name__ == "__main__":
    main()
