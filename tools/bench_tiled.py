"""High-res overlap-tiled restore benchmark (serving path, real TPU).

Measures steady-state wall-clock for a 1024x1024 restore through
`DACLIPRestorer.restore` (overlap-tiled, feathered, batched sampler) at
T=100 (reference default, `config/daclip-sde/options/test.yml:7-12`) and
T=50 (the serving `sample_T` lever), reference latency anchor:
`/root/reference/universal-image-restoration/config/wild-ir/inference.py:102-123`.

Timing discipline (axon tunnel): every timed window ends in a host-side
checksum of the output array — a bare block_until_ready can return without
waiting on this tunnel, and identical-input repeat calls may be
result-cached, so each iteration gets a fresh random input.

Run from the repo root with nothing else on the host:
    python -m tools.bench_tiled [--size 1024] [--iters 2]
"""

import argparse
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from daclip_tpu.pipeline import DACLIPRestorer, RestorerConfig
from daclip_tpu.factory import create_model
from daclip_tpu.models.unet import ConditionalUNet


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--sample-T", type=int, nargs="*", default=[100, 50])
    args = ap.parse_args(argv)

    model, daclip_params = create_model("daclip_ViT-B-32", precision="bf16")
    cfg = RestorerConfig()
    net = ConditionalUNet(
        nf=cfg.nf, ch_mult=cfg.ch_mult, context_dim=cfg.context_dim,
        use_degra_context=True, use_image_context=True, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 64, 64, 3))
    unet_params = net.init(jax.random.PRNGKey(0), x, x, 1.0,
                           jnp.zeros((1, 512)), jnp.zeros((1, 512)))
    up = unet_params["params"] if "params" in unet_params else unet_params
    rng = np.random.RandomState(0)

    for T in args.sample_T:
        c = dataclasses.replace(cfg, sample_T=(T if T != 100 else -1))
        r = DACLIPRestorer(c, up, daclip_params)
        img = (rng.rand(args.size, args.size, 3) * 255).astype(np.uint8)
        t0 = time.time()
        r.restore(img, seed=1)
        print(f"T={T} first (incl. compiles): {time.time() - t0:.1f}s", flush=True)
        for i in range(args.iters):
            img2 = (rng.rand(args.size, args.size, 3) * 255).astype(np.uint8)
            t0 = time.time()
            out2 = r.restore(img2, seed=2 + i)
            dt = time.time() - t0
            checksum = int(np.asarray(out2, np.int64).sum() % 997)
            print(f"T={T} steady {args.size}x{args.size}: {dt:.2f}s "
                  f"(sum {checksum})", flush=True)


if __name__ == "__main__":
    main()
