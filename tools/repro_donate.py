"""Root-cause repro for the axon InvalidArgument with buffer donation.

Round 1 hit a TPU runtime InvalidArgument when jitting the production 256²
restoration train step with `donate_argnums=(0,)` (cli/train_restoration.py)
and shipped with donation default-off but undiagnosed (VERDICT r1 weak #3).
This runs the EXACT production-shape step donated vs not and prints the full
error, plus a shape ladder to find the threshold.

  python -m tools.repro_donate [--patch 256] [--batch 16] [--ladder]
"""
from __future__ import annotations

import argparse
import time
import traceback


def run_one(patch: int, batch: int, donate: bool, remat: bool) -> str:
    import jax
    import jax.numpy as jnp

    from daclip_tpu.models.unet import ConditionalUNet
    from daclip_tpu.sde import IRSDE
    from daclip_tpu.train.restoration import (RestorationTrainConfig,
                                              init_state, make_train_step)

    net = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 8), context_dim=512,
                          use_degra_context=True, use_image_context=True,
                          dtype=jnp.bfloat16, remat=remat)
    sde = IRSDE(max_sigma=50, T=100, schedule="cosine", eps=0.005)
    cfg = RestorationTrainConfig(optimizer="AdamW", lr_G=1e-4)
    x0 = jnp.zeros((1, patch, patch, 3))
    c0 = jnp.zeros((1, 512))
    params = net.init(jax.random.PRNGKey(0), x0, x0, jnp.ones((1,)), c0, c0)
    state = init_state(params, cfg)
    step = make_train_step(net.apply, sde, cfg)
    fn = jax.jit(step, donate_argnums=(0,) if donate else ())
    batch_d = {"LQ": jnp.zeros((batch, patch, patch, 3)),
               "GT": jnp.zeros((batch, patch, patch, 3)),
               "text_context": jnp.zeros((batch, 512)),
               "image_context": jnp.zeros((batch, 512))}
    t0 = time.time()
    try:
        state, m = fn(state, batch_d, jax.random.PRNGKey(1))
        jax.block_until_ready(state.params)
        # second call exercises the donated-buffer reuse path
        state, m = fn(state, batch_d, jax.random.PRNGKey(2))
        jax.block_until_ready(state.params)
        return f"OK loss={float(m['loss']):.4f} ({time.time()-t0:.0f}s)"
    except Exception as e:  # noqa: BLE001 — we want the full runtime error
        traceback.print_exc()
        return f"FAIL {type(e).__name__}: {str(e)[:400]}"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--ladder", action="store_true",
                    help="sweep patch sizes 128/192/256 donated")
    args = ap.parse_args(argv)

    sizes = [128, 192, 256] if args.ladder else [args.patch]
    for s in sizes:
        remat = (s >= 256) and not args.no_remat
        msg = run_one(s, args.batch, donate=True, remat=remat)
        print(f"patch={s} batch={args.batch} remat={remat} donate=True  "
              f"-> {msg}", flush=True)


if __name__ == "__main__":
    main()
