"""Dev tool: per-op ROOFLINE accounting of the flagship UNet forward.

For every device op above a time threshold, reads the profiler's own per-op
counters (`flops`, `bytes_accessed`) and the device peaks
(`peak_teraflops_per_second`, `peak_hbm_bw_gigabytes_per_second`) from the
xplane and prints achieved vs bound:

    bound_ms = max(flops / peak_flops, bytes / peak_hbm_bw)
    headroom = actual_ms - bound_ms

This converts "the forward is at a floor" from an inference-by-negative-
results into an accounting: an op at ~100% of bound cannot be made faster on
this chip without changing the math; the sum of headrooms is the theoretical
remaining win.  Same chained-forward construction as tools/profile_forward
(the only honest wallclock on the axon tunnel).

  python -m tools.roofline [--batch 32] [--size 256] [--chain 10] [--min-ms 0.5]

`--train` accounts the restoration TRAIN step instead (B16/256²/remat
production config, tools/profile_train's chained-scan construction): forward
+ backward + AdamW + EMA, the 81.3 samples/s headline path.
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import tempfile

from tools.profile_forward import _load_xspace


# --- analytic floor models for the pallas custom-calls -------------------
# The profiler carries no flops/bytes counters for custom-calls, so the main
# table shows them at 0% of bound.  These models count only the unavoidable
# MXU dots (flops floor) and unavoidable HBM traffic (bytes floor) of each
# kernel family, so the derived bound is a true floor and %bnd ≤ 100 stays
# meaningful.  Shapes are recorded by tracing the profiled function once with
# the kernel entries monkeypatched (eval_shape — no device work), which also
# counts remat recomputes the way the device executes them.
#
# The floors are LOOSE for the linear-attention wraps: they do not model MXU
# systolic-depth underutilization (the qkv dots contract over K=C, 64-256 at
# the shallow sites — ≤50% of the 128-deep array), the per-head softmax exp
# on the VPU, the f32 LN statistics work, or pipeline bubbles between the
# split kernels; achieved-vs-floor ratios of 3-5× at those sites mean "the
# true bound is between", not "4× headroom" — the measured negative results
# (manual-XLA wash, composed-XLA 2.6× slower, packing wash; BASELINE.md) are
# the practical bound evidence.

_HID = 128  # heads * dim_head of the UNet LinearAttention (4 × 32)


def _cost_wrap_v5_fwd(rec):
    (B, n, C), = rec
    # qkv (3 C·HID dots) + context e·v (HID²) + q_soft·W (HID²) + out (HID·C)
    fl = 2 * B * n * (4 * C * _HID + 2 * _HID * _HID)
    by = 3 * B * n * C * 2          # x read by both split kernels + out write
    return fl, by


def _cost_wrap_v5_bwd(rec):
    (B, n, C), = rec
    # both passes recompute the fwd dots + the grad dots (dW, dwout, dqkv,
    # dxn, dwqkv) — only C- and HID-sized MXU dots counted
    fl = 2 * B * n * (10 * C * _HID + 6 * _HID * _HID)
    # x,g read by both passes + dx write + f32 weight-grad partials
    by = 5 * B * n * C * 2 + B * (_HID * _HID + 4 * _HID * C) * 4
    return fl, by


def _cost_flash_fwd(rec):
    (B, N, HD), heads, dim_head = rec
    return 4 * B * heads * N * N * dim_head, 4 * B * N * HD * 2


def _cost_flash_bwd(rec):
    (B, N, HD), heads, dim_head = rec
    # recompute S + dV/dP/dQ/dK matmuls
    fl = 10 * B * heads * N * N * dim_head
    by = 7 * B * N * HD * 2 + B * N * heads * 4
    return fl, by


# ordered: first matching prefix wins (bwd before fwd)
_FAMILIES = [
    ("attn_wrap_v5_bwd", "attn_wrap_v5_bwd_pallas", _cost_wrap_v5_bwd),
    ("attn_wrap_v5", "attn_wrap_v5 (split fwd)", _cost_wrap_v5_fwd),
    ("flash_self_attention_bwd", "flash_self_attention_bwd",
     _cost_flash_bwd),
    ("flash_self_attention", "flash_self_attention (fwd)", _cost_flash_fwd),
]


def record_pallas_calls(fn, *args):
    """jax.eval_shape(fn, *args) with the pallas attention entry points
    wrapped to record their call shapes.  Returns {family_label: [records]}
    keyed like _FAMILIES; one record per executed kernel call (includes remat
    recomputes — the backward trace replays the forward wrap)."""
    import jax

    from daclip_tpu.ops import flash_attention as fa
    from daclip_tpu.ops import linear_attention as la

    calls = collections.defaultdict(list)
    spec = [
        (la, "attn_wrap_fused_v5", "attn_wrap_v5 (split fwd)",
         lambda a, k: (tuple(a[0].shape),)),
        (la, "attn_wrap_v5_bwd_pallas", "attn_wrap_v5_bwd_pallas",
         lambda a, k: (tuple(a[0].shape),)),
        (fa, "flash_self_attention_pallas", "flash_self_attention (fwd)",
         lambda a, k: (tuple(a[0].shape), a[3], a[4])),
        (fa, "flash_self_attention_bwd_pallas", "flash_self_attention_bwd",
         lambda a, k: (tuple(a[0].shape), a[5], a[6])),
    ]
    saved = []
    try:
        for mod, name, label, shape_of in spec:
            orig = getattr(mod, name)
            saved.append((mod, name, orig))

            def rec(*a, _o=orig, _l=label, _s=shape_of, **k):
                calls[_l].append(_s(a, k))
                return _o(*a, **k)

            setattr(mod, name, rec)
        jax.eval_shape(fn, *args)
    finally:
        for mod, name, orig in saved:
            setattr(mod, name, orig)
    return dict(calls)


def roofline(trace_dir, chain, min_ms, pallas_calls=None):
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert files, f"no xplane.pb under {trace_dir}"
    # name -> [ps, flops, bytes, count]
    acc = collections.defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    cats = {}
    peak_tf = peak_bw = None
    for f in files:
        xs = _load_xspace(f)
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            emeta = plane.event_metadata
            smeta = plane.stat_metadata
            for st in plane.stats:  # device-level peaks
                nm = smeta[st.metadata_id].name
                if nm == "peak_teraflops_per_second":
                    peak_tf = st.double_value or st.uint64_value
                elif nm == "peak_hbm_bw_gigabytes_per_second":
                    peak_bw = st.double_value or st.uint64_value
            for line in plane.lines:
                for ev in line.events:
                    md = emeta[ev.metadata_id]
                    name = md.name
                    # all-digit names are region/step markers spanning whole
                    # launches (e.g. the scan trip region), not device ops
                    if not name or name.startswith("jit_") or name.isdigit():
                        continue
                    stats = {}
                    for st in list(ev.stats) + list(md.stats):
                        sm = smeta[st.metadata_id]
                        stats[sm.name] = (st.str_value or st.int64_value
                                          or st.uint64_value or st.double_value
                                          or (st.ref_value
                                              and smeta[st.ref_value].name))
                    cat = str(stats.get("hlo_category", ""))
                    if ("copy-start" in name or "async-start" in name
                            or cat == "while"
                            or name.startswith(("copy-start", "slice-start",
                                                "while"))):
                        continue
                    a = acc[name]
                    a[0] += ev.duration_ps
                    a[1] += float(stats.get("flops", 0) or 0)
                    a[2] += float(stats.get("bytes_accessed", 0) or 0)
                    a[3] += 1
                    cats[name] = cat
    assert peak_tf and peak_bw, (peak_tf, peak_bw)
    print(f"device peaks: {peak_tf:.0f} TF/s, {peak_bw:.0f} GB/s HBM")
    hdr = (f"{'ms/fwd':>7} {'bound':>7} {'head':>6} {'%bnd':>5} "
           f"{'GF/fwd':>8} {'GB/fwd':>7} {'TF/s':>6} {'GB/s':>6}  op")
    print(hdr)
    rows = []
    for name, (ps, fl, by, n) in acc.items():
        ms = ps / 1e12 * 1000 / chain
        if ms < min_ms:
            continue
        fl, by = fl / chain, by / chain
        t_flops = fl / (peak_tf * 1e12) * 1000   # ms at peak MXU
        t_bytes = by / (peak_bw * 1e9) * 1000    # ms at peak HBM
        bound = max(t_flops, t_bytes)
        rows.append((ms, bound, fl, by, name))
    rows.sort(key=lambda r: -r[0])
    tot_ms = tot_bound = 0.0
    for ms, bound, fl, by, name in rows:
        label = name.split(" ", 1)[0].lstrip("%")
        pct = 100.0 * bound / ms if ms else 0.0
        tf = fl / (ms / 1000) / 1e12 if ms else 0.0
        gbs = by / (ms / 1000) / 1e9 if ms else 0.0
        tot_ms += ms
        tot_bound += bound
        print(f"{ms:7.3f} {bound:7.3f} {ms-bound:6.3f} {pct:5.0f} "
              f"{fl/1e9:8.2f} {by/1e9:7.3f} {tf:6.1f} {gbs:6.0f}  "
              f"{label[:44]:44s} [{cats.get(name, '')[:16]}]")
    small = sum(a[0] for a in acc.values()) / 1e12 * 1000 / chain - tot_ms
    print(f"{tot_ms:7.3f} {tot_bound:7.3f} {tot_ms-tot_bound:6.3f} "
          f"{100*tot_bound/max(tot_ms,1e-9):5.0f}  TOTAL of rows above "
          f"(+{small:.1f} ms in ops < {min_ms} ms)")

    if not pallas_calls:
        return
    print("\ncustom-call families (analytic floor models — unavoidable MXU "
          "dots / HBM traffic;\nshapes recorded from a traced step incl. "
          "remat recomputes):")
    print(f"{'ms/step':>8} {'bound':>7} {'%bnd':>5} {'calls':>5} "
          f"{'GF':>8} {'GB':>7}  family")
    for prefix, label, cost in _FAMILIES:
        recs = pallas_calls.get(label)
        ms = sum(ps for name, (ps, _f, _b, _n) in acc.items()
                 if name.lstrip("%").startswith(prefix)
                 and _match_family(name) == prefix) / 1e12 * 1000 / chain
        if not recs:
            if ms > 0:
                print(f"{ms:8.3f} {'?':>7} {'?':>5} {'?':>5}"
                      f" {'?':>8} {'?':>7}  {label} (no shapes recorded)")
            continue
        fl = sum(cost(r)[0] for r in recs)
        by = sum(cost(r)[1] for r in recs)
        bound = max(fl / (peak_tf * 1e12), by / (peak_bw * 1e9)) * 1000
        pct = 100.0 * bound / ms if ms else 0.0
        print(f"{ms:8.3f} {bound:7.3f} {pct:5.0f} {len(recs):5d} "
              f"{fl/1e9:8.2f} {by/1e9:7.3f}  {label}")


def _match_family(name):
    """First _FAMILIES prefix that matches (bwd prefixes listed first)."""
    base = name.lstrip("%")
    for prefix, _label, _cost in _FAMILIES:
        if base.startswith(prefix):
            return prefix
    return None


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 32 forward (bench config), 16 --train "
                    "(production train config)")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--min-ms", type=float, default=0.5)
    ap.add_argument("--trace-dir", default=None,
                    help="reuse an existing trace instead of re-profiling")
    ap.add_argument("--train", action="store_true",
                    help="account the restoration train step (B16 default) "
                         "instead of the forward")
    args = ap.parse_args(argv)

    if args.trace_dir:
        roofline(args.trace_dir, args.chain, args.min_ms)
        return

    import jax
    import jax.numpy as jnp

    from daclip_tpu.models.unet import ConditionalUNet

    if args.train:
        from daclip_tpu.sde import IRSDE
        from daclip_tpu.train.restoration import (RestorationTrainConfig,
                                                  init_state, make_train_step)

        B = 16 if args.batch is None else args.batch  # train default is B16
        S = args.size
        net = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 8), context_dim=512,
                              use_degra_context=True, use_image_context=True,
                              remat=True, dtype=jnp.bfloat16)
        lq = jnp.zeros((B, S, S, 3), jnp.float32)
        ctx = jnp.zeros((B, 512), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), lq, lq, jnp.ones((B,)),
                          ctx, ctx)
        sde = IRSDE(max_sigma=50, T=100, schedule="cosine", eps=0.005)
        step = make_train_step(net.apply, sde, RestorationTrainConfig())
        state = init_state(params, RestorationTrainConfig())
        batch = {"LQ": lq, "GT": lq, "text_context": ctx,
                 "image_context": ctx}

        @jax.jit
        def chained_train(st, key):
            def body(s, k):
                s, metrics = step(s, batch, k)
                return s, metrics["loss"]
            return jax.lax.scan(body, st, jax.random.split(key, args.chain))

        calls = record_pallas_calls(
            lambda s, k: step(s, batch, k), state, jax.random.PRNGKey(3))
        st, _ = chained_train(state, jax.random.PRNGKey(1))
        jax.block_until_ready(st)  # compile outside the trace
        trace_dir = tempfile.mkdtemp(prefix="daclip_roofline_train_")
        with jax.profiler.trace(trace_dir):
            st, _ = chained_train(st, jax.random.PRNGKey(2))
            jax.block_until_ready(st)
        print(f"trace: {trace_dir}")
        roofline(trace_dir, args.chain, args.min_ms, calls)
        return

    B, S = (32 if args.batch is None else args.batch), args.size
    net = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 8), context_dim=512,
                          use_degra_context=True, use_image_context=True,
                          dtype=jnp.bfloat16)
    x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
    ctx = jnp.zeros((B, 512), jnp.bfloat16)
    params = jax.eval_shape(lambda k: net.init(k, x, x, 1.0, ctx, ctx),
                            jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: jnp.full(a.shape, 0.01, a.dtype), params)
    tb = jnp.full((B,), 50.0)

    @jax.jit
    def chained(xt):
        def body(_, h):
            y = net.apply(params, h, x, tb, ctx, ctx)
            return jnp.clip(y, -3, 3).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, args.chain, body, xt)

    calls = record_pallas_calls(
        lambda xt: net.apply(params, xt, x, tb, ctx, ctx), x)
    chained(x).block_until_ready()  # compile outside the trace
    trace_dir = tempfile.mkdtemp(prefix="daclip_roofline_")
    with jax.profiler.trace(trace_dir):
        chained(x).block_until_ready()
    print(f"trace: {trace_dir}")
    roofline(trace_dir, args.chain, args.min_ms, calls)


if __name__ == "__main__":
    main()
