"""Model profiling — training/profile.py:18-133 equivalent via XLA cost analysis
(jit(...).lower().compile().cost_analysis()) instead of fvcore, plus param counts
per tower and simple wallclock timers.

CLI: python -m daclip_tpu.utils.profile --model daclip_ViT-B-32
"""
from __future__ import annotations

import argparse
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def count_params(tree) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(tree)))


def cost_analysis(fn, *args) -> Dict[str, float]:
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return {"gflops": c.get("flops", 0.0) / 1e9,
                "gbytes": c.get("bytes accessed", 0.0) / 1e9}
    except Exception:
        return {"gflops": float("nan"), "gbytes": float("nan")}


def wallclock_ms(fn, *args, iters: int = 10) -> float:
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000


def profile_clip(model_name: str = "daclip_ViT-B-32", batch: int = 1,
                 force_cpu: bool = False):
    from daclip_tpu.models import CLIPCfg, DaCLIP, get_model_config

    cfg = CLIPCfg.from_dict(get_model_config(model_name))
    model = DaCLIP(cfg)
    img = jnp.zeros((batch, cfg.vision.image_size, cfg.vision.image_size, 3))
    txt = jnp.zeros((batch, cfg.text.context_length), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), image=img,
                           text=jnp.concatenate([txt, txt], -1))
    p = variables["params"]
    rows = {
        "clip.visual": count_params(p["clip"]["visual"]),
        "clip.text": count_params(p["clip"]["text"]),
        "visual_control": count_params(p["visual_control"]),
        "total": count_params(p),
    }
    enc_img = lambda x: model.apply(variables, x, control=True,
                                    method=model.encode_image)
    enc_txt = lambda x: model.apply(variables, x, method=model.encode_text)
    out = {
        "params": {k: v / 1e6 for k, v in rows.items()},
        "encode_image_control": cost_analysis(enc_img, img),
        "encode_text": cost_analysis(enc_txt, txt),
    }
    return out


def profile_unet(nf: int = 64, ch_mult=(1, 2, 4, 8), context_dim: int = 512,
                 size: int = 256, batch: int = 1):
    from daclip_tpu.models.unet import ConditionalUNet

    net = ConditionalUNet(nf=nf, ch_mult=tuple(ch_mult), context_dim=context_dim,
                          use_degra_context=True, use_image_context=True)
    x = jnp.zeros((batch, size, size, 3))
    ctx = jnp.zeros((batch, context_dim))
    params = net.init(jax.random.PRNGKey(0), x, x, jnp.ones((batch,)), ctx, ctx)
    fwd = lambda xt: net.apply(params, xt, x, jnp.ones((batch,)), ctx, ctx)
    return {"params_M": count_params(params) / 1e6,
            "forward": cost_analysis(fwd, x)}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="daclip_ViT-B-32")
    p.add_argument("--unet-size", type=int, default=256)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args(argv)
    import json
    print(json.dumps({"clip": profile_clip(args.model, args.batch),
                      "unet": profile_unet(size=args.unet_size,
                                           batch=args.batch)}, indent=2,
                     default=float))


if __name__ == "__main__":
    main()
