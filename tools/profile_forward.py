"""Dev tool: per-op DEVICE-time breakdown of the flagship UNet forward.

Runs the chained full forward (same construction as tools/time_forward — the
only honest wallclock on the axon tunnel) under `jax.profiler.trace`, parses
the resulting xplane proto, and prints the top HLO ops by total device time,
normalised to ms per single forward.  Joins each op to its `tf_op`/source
metadata where present so hotspots map back to model code.

  python -m tools.profile_forward [--batch 32] [--size 256] [--chain 10] [--top 45]
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import tempfile


def _load_xspace(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def summarize(trace_dir, chain, top):
    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert files, f"no xplane.pb under {trace_dir}"
    totals = collections.defaultdict(float)   # name -> ps
    counts = collections.defaultdict(int)
    meta_info = {}
    for f in files:
        xs = _load_xspace(f)
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            emeta = plane.event_metadata
            smeta = plane.stat_metadata
            for line in plane.lines:
                for ev in line.events:
                    md = emeta[ev.metadata_id]
                    name = md.name
                    if not name or name.startswith("jit_"):
                        continue  # whole-module umbrella event
                    info = ""
                    for st in list(ev.stats) + list(md.stats):
                        sm = smeta[st.metadata_id]
                        if sm.name in ("tf_op", "hlo_category"):
                            val = (st.str_value
                                   or st.ref_value and smeta[st.ref_value].name)
                            info += f" {sm.name}={val}"
                    # async copies/slices overlap compute; the while op is an
                    # umbrella over the whole loop — both double-count
                    if ("copy-start" in info or "async-start" in info
                            or "category=while" in info
                            or name.startswith(("copy-start", "slice-start",
                                                "while"))):
                        continue
                    totals[name] += ev.duration_ps
                    counts[name] += 1
                    if name not in meta_info:
                        meta_info[name] = info
    grand = sum(totals.values())
    print(f"total device op-time: {grand/1e12*1000:.1f} ms over trace "
          f"({grand/1e12*1000/max(chain,1):.2f} ms/forward)")
    print(f"{'ms/fwd':>8} {'calls':>6}  name")
    shown = 0.0
    for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        ms = ps / 1e12 * 1000 / max(chain, 1)
        shown += ms
        info = meta_info.get(name, "")
        # keep the informative tail of the tf_op path (module names)
        m = info.find("tf_op=")
        tf_op = info[m + 6:].strip() if m >= 0 else ""
        cat = ""
        c = info.find("hlo_category=")
        if c >= 0:
            cat = info[c + 13:].split(" tf_op=")[0]
        shape = name.split("= ", 1)[-1].split(" ", 1)[0] if "= " in name else ""
        label = name.split(" ", 1)[0].lstrip("%")
        print(f"{ms:8.3f} {counts[name]:6d}  {label[:40]:40s} {shape[:34]:34s} "
              f"[{cat[:18]}] {tf_op[-95:]}")
    print(f"(top {top} account for {shown:.1f} ms/fwd of {grand/1e12*1000/max(chain,1):.1f})")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--trace-dir", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from daclip_tpu.models.unet import ConditionalUNet

    B, S = args.batch, args.size
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

    chained(x).block_until_ready()  # compile outside the trace
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="daclip_prof_")
    with jax.profiler.trace(trace_dir):
        chained(x).block_until_ready()
    print(f"trace: {trace_dir}")
    summarize(trace_dir, args.chain, args.top)


if __name__ == "__main__":
    main()
