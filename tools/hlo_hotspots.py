"""Dev tool: map profiled fusion names to HLO source metadata.

Compiles the flagship forward (cached after the first run), walks the
optimized HLO, and prints every fusion/op whose name matches the given
prefixes together with its op_name metadata + source line — joins the
profile_forward output back to model code.

  python -m tools.hlo_hotspots divide_multiply_fusion fusion.10 copy.304
"""
from __future__ import annotations

import re
import sys


def main(argv=None):
    names = set(argv if argv is not None else sys.argv[1:])

    import jax
    import jax.numpy as jnp

    from daclip_tpu.models.unet import ConditionalUNet

    B, S = 32, 256
    net = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 8), context_dim=512,
                          use_degra_context=True, use_image_context=True,
                          dtype=jnp.bfloat16)
    x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
    ctx = jnp.zeros((B, 512), jnp.bfloat16)
    params = jax.eval_shape(lambda k: net.init(k, x, x, 1.0, ctx, ctx),
                            jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), params)
    tb = jnp.full((B,), 50.0)

    def fwd(p, xt, mu, t, tc, ic):
        return net.apply(p, xt, mu, t, tc, ic)

    compiled = jax.jit(fwd).lower(params, x, x, tb, ctx, ctx).compile()
    txt = compiled.as_text()

    # index: fusion name -> its root instruction line(s) with metadata
    cur_fusion = None
    want = None
    for line in txt.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s*=.*", line)
        if "fusion(" in line or re.search(r"= \S+ (copy|transpose|convolution)\(", line):
            nm = m.group(1) if m else ""
            if nm.rstrip("_") in names or nm in names:
                meta = re.search(r'metadata=\{([^}]*)\}', line)
                shape = re.search(r"= (\S+) ", line)
                print(f"== {nm}: shape={shape.group(1) if shape else '?'}")
                if meta:
                    print(f"   {meta.group(1)[:400]}")
                if "fusion(" in line:
                    cm = re.search(r"calls=([\w.\-]+)", line)
                    if cm:
                        want = cm.group(1)
                        print(f"   calls {want}")
    if want:
        # print the called computation bodies for the last match
        for name in [want]:
            block = re.search(
                rf"%{re.escape(name)} [^\n]*\{{(.*?)\n\}}", txt, re.S)
            if block:
                body = block.group(1)
                print(f"---- {name} ({len(body.splitlines())} lines)")
                for ln in body.splitlines()[:60]:
                    print("   ", ln[:220])


if __name__ == "__main__":
    main()
