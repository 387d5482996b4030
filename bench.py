"""Headline benchmark: restored images/sec/chip at 256x256 with 100 SDE steps.

Matches BASELINE.json's metric: the full IR-SDE posterior sampler (100 UNet
forwards per image, production config nf=64 ch_mult=[1,2,4,8] context_dim=512,
both DA-CLIP contexts active) as ONE jitted lax.scan, bf16 compute, on a single
real chip.

The reference publishes no numbers (BASELINE.md); `vs_baseline` is computed
against an ESTIMATED A100-PyTorch-eager throughput derived from the measured
per-image FLOPs and an assumed 25% fp16 MFU for the torch eager 100-step loop
(A100 peak 312 TFLOP/s) — documented in BASELINE.md as an estimate, not a
measurement.  Target from BASELINE.json: >=5x that A100 estimate.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""
import json
import subprocess
import sys
import time

import jax
import jax.numpy as jnp

BATCH = 32
H = W = 256
STEPS = 100
A100_PEAK_FP16 = 312e12
A100_ASSUMED_MFU = 0.25


def _wait_for_device(max_wait_s: float = 1800.0):
    """Block until the TPU backend initializes, surviving transient tunnel
    outages (observed: backend init hanging ~10 min then UNAVAILABLE).  The
    probe runs in a subprocess so a failed init is never cached in THIS
    process's jax backend state."""
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=240, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            raise RuntimeError(
                f"TPU backend unavailable after {max_wait_s:.0f}s "
                f"({attempt} probe attempts)")
        print(f"# device probe {attempt} failed; retrying in 60s",
              file=sys.stderr, flush=True)
        time.sleep(60)


def main():
    _wait_for_device()
    from daclip_tpu.models.unet import ConditionalUNet
    from daclip_tpu.sde import IRSDE

    dev = jax.devices()[0]
    net = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 8), context_dim=512,
                          use_degra_context=True, use_image_context=True,
                          dtype=jnp.bfloat16)
    lq = jnp.zeros((BATCH, H, W, 3), jnp.float32)
    tctx = jnp.zeros((BATCH, 512), jnp.float32)
    ictx = jnp.zeros((BATCH, 512), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), lq, lq, jnp.ones((BATCH,)),
                      tctx, ictx)
    sde = IRSDE(max_sigma=50, T=STEPS, schedule="cosine", eps=0.005)

    def noise_fn(x, mu, t, **ctx):
        return net.apply(params, x, mu, t, ctx.get("text_context"),
                         ctx.get("image_context"))

    @jax.jit
    def restore(lq, key):
        x_T = sde.noise_state(key, lq)
        return sde.reverse_posterior(noise_fn, x_T, lq, key,
                                     text_context=tctx, image_context=ictx)

    # single-forward FLOPs for the baseline estimate
    fwd = jax.jit(lambda x: net.apply(params, x, lq, jnp.ones((BATCH,)),
                                      tctx, ictx))
    try:
        cost = fwd.lower(lq).compile().cost_analysis()
        flops_fwd = float(cost.get("flops", 0.0))
    except Exception:
        flops_fwd = 0.0
    flops_per_image = flops_fwd / BATCH * STEPS

    key = jax.random.PRNGKey(1)
    # warmup/compile; a host read (not a bare block_until_ready, which can
    # return early on the axon tunnel) guarantees it finished
    float(jnp.sum(restore(lq, key)))
    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = restore(lq, jax.random.fold_in(key, i + 1))
    # end the timed window with a host-side checksum — the only wait that is
    # honest on this tunnel (see CLAUDE.md timing notes)
    checksum = float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n_iters
    del checksum

    ips = BATCH / dt
    p50_latency_ms = dt / BATCH * 1000.0

    baseline_ips = (A100_PEAK_FP16 * A100_ASSUMED_MFU / flops_per_image
                    if flops_per_image else 0.0)
    vs_baseline = ips / baseline_ips if baseline_ips else 0.0

    print(json.dumps({
        "metric": "restored images/sec/chip, 256x256, 100-step posterior IR-SDE",
        "value": round(ips, 4),
        "unit": "images/sec",
        "vs_baseline": round(vs_baseline, 3),
        "batch": BATCH,
        "p50_latency_ms_per_image": round(p50_latency_ms, 2),
        "unet_tflops_per_image_100steps": round(flops_per_image / 1e12, 2),
        "device": str(dev),
        "baseline": "estimated A100 torch-eager (25% MFU of 312 TFLOP/s fp16); "
                    "reference publishes no numbers — see BASELINE.md",
    }))


if __name__ == "__main__":
    main()
