"""Quality/latency sweep over reduced sampling steps (`sample_T`).

VERDICT r1 #9: the reference's per-image "average test time" metric
(config/daclip-sde/test.py:122-125,234) has one quality point (T=100); the
TPU rebuild exposes `sample_T` as a latency knob but had no measured curve.

Quality leg (no trained weights exist in this egress-denied env): run the
posterior sampler with the ANALYTIC optimal noise (sde.get_real_noise given
GT — sde_utils.py:129-133 / optimal_reverse oracle), so PSNR-vs-steps
isolates the SAMPLER's discretization error, the part that `sample_T`
actually controls.  A trained network's PSNR curve sits below this oracle
curve by its (step-independent) score error.

Latency leg: the production UNet (B=1, 256², bf16) inside the jitted
`reverse_posterior` scan — weights irrelevant to wallclock.  Varied keys per
call defeat the axon result cache (benchmark methodology memory).

  python -m tools.sweep_sample_T [--steps 100 50 25 10] [--skip-latency]
"""
from __future__ import annotations

import argparse
import json
import time


def psnr(a, b):
    import numpy as np
    mse = float(((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2
                 ).mean())
    return 99.0 if mse == 0 else 10 * np.log10(1.0 / mse)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, nargs="+", default=[100, 50, 25, 10])
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--quality-batch", type=int, default=8)
    ap.add_argument("--skip-latency", action="store_true")
    ap.add_argument("--latency-reps", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from daclip_tpu.sde import IRSDE

    # synthetic paired set: smooth GT (low-freq mixture), LQ = blur+noise —
    # mirrors the generate_LQ blur/noise grid (tools/generate_lq.py) without
    # needing image assets
    S, B = args.size, args.quality_batch
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.linspace(0, 1, S), np.linspace(0, 1, S),
                         indexing="ij")
    gt = np.zeros((B, S, S, 3), np.float32)
    for b in range(B):
        for c in range(3):
            img = sum(rng.rand() * np.sin(2 * np.pi * (
                rng.randint(1, 6) * yy + rng.randint(1, 6) * xx
                + rng.rand())) for _ in range(4))
            gt[b, :, :, c] = img
    gt = (gt - gt.min()) / (gt.max() - gt.min())
    k = np.ones((9, 9), np.float32) / 81.0
    lq = np.stack([np.stack([
        np.real(np.fft.ifft2(np.fft.fft2(gt[b, :, :, c]) *
                             np.fft.fft2(k, (S, S))))
        for c in range(3)], -1) for b in range(B)]).astype(np.float32)
    lq += rng.randn(*lq.shape).astype(np.float32) * 0.04

    results = []
    for st in args.steps:
        sde = IRSDE(max_sigma=50, T=100, sample_T=st, schedule="cosine",
                    eps=0.005)
        x0 = jnp.asarray(gt)
        scale = sde.sample_scale

        def ideal_noise(x, mu, tb, **ctx):
            t = jnp.round(tb[0] / scale).astype(jnp.int32)
            return sde.get_real_noise(x, x0, mu, t)

        @jax.jit
        def restore(mu, key):
            xt = sde.noise_state(key, mu)
            return (sde.reverse_posterior(ideal_noise, xt, mu, key),
                    sde.reverse_sde(ideal_noise, xt, mu, key))

        outp, outs = jax.block_until_ready(restore(jnp.asarray(lq),
                                                   jax.random.PRNGKey(1)))
        # NOTE: posterior+true-noise is exact at ANY step count
        # (reverse_optimum_step reconstructs x0 algebraically), so its
        # oracle PSNR only certifies sampler correctness; the Euler
        # reverse_sde oracle curve is the one that shows step-count
        # discretization error.
        row = {"sample_T": st,
               "posterior_oracle_psnr_db":
                   round(psnr(np.clip(np.asarray(outp), 0, 1), gt), 2),
               "sde_oracle_psnr_db":
                   round(psnr(np.clip(np.asarray(outs), 0, 1), gt), 2),
               "lq_psnr_db": round(psnr(np.clip(lq, 0, 1), gt), 2)}

        if not args.skip_latency:
            from daclip_tpu.models.unet import ConditionalUNet
            net = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 8),
                                  context_dim=512, use_degra_context=True,
                                  use_image_context=True, dtype=jnp.bfloat16)
            x1 = jnp.zeros((1, S, S, 3), jnp.float32)
            ctx = jnp.zeros((1, 512), jnp.float32)
            params = net.init(jax.random.PRNGKey(0), x1, x1, jnp.ones((1,)),
                              ctx, ctx)

            def noise_fn(x, mu, t, **c):
                return net.apply(params, x, mu, t, ctx, ctx).astype(x.dtype)

            @jax.jit
            def restore1(mu, key):
                xt = sde.noise_state(key, mu)
                return sde.reverse_posterior(noise_fn, xt, mu, key)

            t0 = time.time()
            jax.block_until_ready(restore1(x1, jax.random.PRNGKey(0)))
            compile_s = time.time() - t0
            lats = []
            for r in range(args.latency_reps):
                t0 = time.time()
                jax.block_until_ready(restore1(x1, jax.random.PRNGKey(r + 1)))
                lats.append(time.time() - t0)
            row.update(latency_p50_ms=round(sorted(lats)[len(lats) // 2] * 1e3,
                                            1),
                       compile_s=round(compile_s, 1))
        results.append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()
