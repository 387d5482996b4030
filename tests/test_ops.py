"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on TPU
during benches)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_conv3x3_pallas_interpret_matches_lax():
    from daclip_tpu.ops import conv3x3

    rng = np.random.RandomState(0)
    B, H, W, C, O = 1, 8, 16, 64, 64
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, O) * 0.05, jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # run the same kernel math in interpret mode
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Cp = C  # already 64; interpret mode is relaxed about tiling
    Wp = -(-(W + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + Wp - (W + 2)), (0, 0)))
    got = pl.pallas_call(
        functools.partial(conv3x3._kernel, TH=8, W=W, C=C, O=O),
        grid=(B, H // 8),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((3, 3, C, O), lambda b, h: (0, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, W, O), lambda b, h: (b, h, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        scratch_shapes=[pltpu.VMEM((10, Wp, C), x.dtype),
                        pltpu.SemaphoreType.DMA((1,))],
        interpret=True,
    )(xp, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_linear_attention_pallas_interpret():
    from daclip_tpu.ops.linear_attention import (linear_attention_pallas,
                                                 linear_attention_reference)
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(2, 2048, 384), jnp.float32)
    want = linear_attention_reference(qkv)
    got = linear_attention_pallas(qkv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-4)


def test_conv3x3_supported_gate(monkeypatch):
    from daclip_tpu.ops import conv3x3_supported
    assert not conv3x3_supported((1, 64, 64, 64), 64)  # opt-in flag unset
    from daclip_tpu import flags
    monkeypatch.setattr(flags, "PALLAS_CONV", True)
    # cpu backend in tests -> still False
    assert not conv3x3_supported((1, 64, 64, 64), 64)


def test_flash_attention_interpret_matches_reference():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from daclip_tpu.ops.flash_attention import (_reference,
                                                flash_self_attention_pallas)

    B, heads, N, D = 2, 4, 64, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (B, N, heads * D), jnp.float32)
               for kk in ks)
    got = flash_self_attention_pallas(q, k, v, heads, D, interpret=True)
    want = _reference(q, k, v, heads, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_flash_attention_grad_matches_reference():
    """custom_vjp backward == autodiff through the XLA composition."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from daclip_tpu.ops import flash_attention as fa

    B, heads, N, D = 1, 2, 16, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (B, N, heads * D), jnp.float32)
               for kk in ks)

    # route the custom_vjp forward through interpret mode on CPU
    orig = fa.flash_self_attention_pallas
    fa_fwd = lambda q, k, v, h, d: orig(q, k, v, h, d, interpret=True)
    fa.flash_self_attention_pallas, saved = fa_fwd, orig
    try:
        f_fused = lambda q, k, v: fa.flash_self_attention(q, k, v, heads, D).sum()
        f_ref = lambda q, k, v: fa._reference(q, k, v, heads, D).sum()
        g1 = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-4)
    finally:
        fa.flash_self_attention_pallas = saved


def test_flash_attention_bwd_kernel_matches_reference_vjp():
    """The pallas backward kernel (interpret mode) == reference autodiff."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from daclip_tpu.ops import flash_attention as fa

    B, heads, N, D = 2, 4, 64, 32
    HD = heads * D
    ks = jax.random.split(jax.random.PRNGKey(2), 4)
    q, k, v, g = (jax.random.normal(kk, (B, N, HD), jnp.float32) for kk in ks)
    ref = lambda q, k, v: fa._reference(q, k, v, heads, D)
    _, vjp = jax.vjp(ref, q, k, v)
    dq_r, dk_r, dv_r = vjp(g)
    out = ref(q, k, v)
    dsum = jnp.einsum("bnhd,bnhd->bnh", g.reshape(B, N, heads, D),
                      out.reshape(B, N, heads, D))
    dq_p, dk_p, dv_p = fa.flash_self_attention_bwd_pallas(
        q, k, v, g, dsum, heads, D, interpret=True)
    for a, b in [(dq_p, dq_r), (dk_p, dk_r), (dv_p, dv_r)]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_flash_attention_supported_gate():
    from daclip_tpu.ops.flash_attention import flash_attention_supported

    # on the CPU test backend the gate must refuse (kernel needs Mosaic)
    assert not flash_attention_supported(32, 16, 1024, 32)


def test_linear_attention_v4_interpret_matches_v2():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from daclip_tpu.ops.linear_attention import (
        linear_attention_fused_pallas, linear_attention_fused_v4)

    B, n, C = 2, 2048, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (B, n, C), jnp.float32)
    wqkv = jax.random.normal(ks[1], (C, 384), jnp.float32) * 0.1
    wout = jax.random.normal(ks[2], (128, C), jnp.float32) * 0.1
    bout = jax.random.normal(ks[3], (C,), jnp.float32) * 0.1
    gout = jax.random.normal(ks[4], (C,), jnp.float32)
    a = linear_attention_fused_v4(x, wqkv, wout, bout, gout, interpret=True)
    b = linear_attention_fused_pallas(x, wqkv, wout, bout, gout,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("pack,C", [("0", 64), ("1", 64), ("0", 128),
                                    ("0", 256)])
def test_attn_wrap_v5_interpret_matches_reference(monkeypatch, pack, C):
    """v5 whole-wrap (Residual(PreNorm(LinearAttention)), split kernels,
    MXU-dot LN reductions) vs the XLA composition reference — the plain and
    pixel-pair-packed (DACLIP_TPU_ATTN_PACK) layouts at L0 width, plus the
    production L1/L2 channel widths."""
    from daclip_tpu.ops.linear_attention import (
        _attn_wrap_composition_reference, attn_wrap_v5)

    from daclip_tpu import flags
    monkeypatch.setattr(flags, "ATTN_PACK", pack == "1")
    key = jax.random.PRNGKey(11)
    B, n = 2, 2048
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (B, n, C)).astype(jnp.bfloat16)
    g_pre = jax.random.normal(ks[1], (C,)).astype(jnp.bfloat16)
    wqkv = (jax.random.normal(ks[2], (C, 384)) * 0.1).astype(jnp.bfloat16)
    wout = (jax.random.normal(ks[3], (128, C)) * 0.1).astype(jnp.bfloat16)
    bout = jax.random.normal(ks[4], (C,)).astype(jnp.bfloat16)
    gout = jax.random.normal(ks[5], (C,)).astype(jnp.bfloat16)
    got = attn_wrap_v5(x, g_pre, wqkv, wout, bout, gout, interpret=True)
    ref = _attn_wrap_composition_reference(x, g_pre, wqkv, wout, bout, gout)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=0.1)


def test_attn_wrap_v5_manual_bwd_exact_in_f32():
    """_wrap_v5_bwd_manual == jax.vjp(reference composition) when nothing
    rounds to bf16 (f32 inputs make every cast a no-op)."""
    import numpy as np

    from daclip_tpu.ops import linear_attention as la

    B, n, C = 2, 256, 64
    k0 = jax.random.PRNGKey(7)
    rnd = lambda i, shape, s=1.0: (
        jax.random.normal(jax.random.fold_in(k0, i), shape, jnp.float32) * s)
    args = (rnd(0, (B, n, C)), rnd(1, (C,)) * 0.2 + 1.0,
            rnd(2, (C, 3 * la.HID), 0.2), rnd(3, (la.HID, C), 0.2),
            rnd(4, (C,), 0.1), rnd(5, (C,)) * 0.2 + 1.0)
    g = rnd(6, (B, n, C))
    _, vjp = jax.vjp(la._attn_wrap_composition_reference, *args)
    want = vjp(g)
    got = la._wrap_v5_bwd_manual(args, g)
    for a, b in zip(got, want):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=2e-5)


@pytest.mark.parametrize("spill_dy", [False, True])
@pytest.mark.parametrize("C", [64, 128, 256, 512])
def test_attn_wrap_v5_pallas_bwd_interpret_matches_manual(C, spill_dy):
    """Two-pass pallas VJP (interpret) == hand-derived manual backward, at
    every channel width the production UNet runs it (L0 64, L1 128, L2 256,
    plus 512 — the context-free config's L3, which takes the halved-chunk
    path that keeps the kernel under the scoped-vmem stack limit), in both
    the self-contained-recompute and dy-spill pass-2 variants."""
    import numpy as np

    from daclip_tpu.ops import linear_attention as la

    B, n = 2, 2048
    k0 = jax.random.PRNGKey(9)
    rnd = lambda i, shape, s=1.0: (
        jax.random.normal(jax.random.fold_in(k0, i), shape, jnp.float32) * s)
    args = (rnd(0, (B, n, C)), rnd(1, (C,)) * 0.2 + 1.0,
            rnd(2, (C, 3 * la.HID), 0.2), rnd(3, (la.HID, C), 0.2),
            rnd(4, (C,), 0.1), rnd(5, (C,)) * 0.2 + 1.0)
    g = rnd(6, (B, n, C))
    _, ctx, s, m = la.attn_wrap_v5(*args, interpret=True, with_stats=True)
    got = la.attn_wrap_v5_bwd_pallas(*args, ctx, s, m, g, interpret=True,
                                     spill_dy=spill_dy)
    want = la._wrap_v5_bwd_manual(args, g)
    if spill_dy:
        # the spill variant must be BIT-identical to the self-contained one
        # (pass 2 consumes dy only through the same bf16 cast)
        base = la.attn_wrap_v5_bwd_pallas(*args, ctx, s, m, g, interpret=True,
                                          spill_dy=False)
        for a, b in zip(got, base):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the kernel rounds matmul operands to bf16 (production dtype) even on
    # f32 inputs; weight-grad chunk sums differ at bf16 rounding level
    for a, b in zip(got, want):
        scale = float(jnp.max(jnp.abs(b))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1.5e-2)


def test_attn_wrap_v5_grad_matches_reference():
    from daclip_tpu.ops import linear_attention as la

    key = jax.random.PRNGKey(12)
    B, n, C = 1, 1024, 64
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (B, n, C)).astype(jnp.bfloat16)
    g_pre = jax.random.normal(ks[1], (C,)).astype(jnp.bfloat16)
    wqkv = (jax.random.normal(ks[2], (C, 384)) * 0.1).astype(jnp.bfloat16)
    wout = (jax.random.normal(ks[3], (128, C)) * 0.1).astype(jnp.bfloat16)
    bout = jax.random.normal(ks[4], (C,)).astype(jnp.bfloat16)
    gout = jax.random.normal(ks[5], (C,)).astype(jnp.bfloat16)

    def loss_fused(*a):
        return jnp.sum(la.attn_wrap_fused_v5(*a).astype(jnp.float32) ** 2)

    def loss_ref(*a):
        return jnp.sum(
            la._attn_wrap_composition_reference(*a).astype(jnp.float32) ** 2)

    # route the custom_vjp forward through interpret mode on CPU
    orig = la.attn_wrap_v5
    la.attn_wrap_v5 = lambda *a, **kw: orig(*a, interpret=True, **kw)
    try:
        g1 = jax.grad(loss_fused, argnums=(0, 2))(x, g_pre, wqkv, wout, bout, gout)
    finally:
        la.attn_wrap_v5 = orig
    g2 = jax.grad(loss_ref, argnums=(0, 2))(x, g_pre, wqkv, wout, bout, gout)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.5, rtol=0.3)


def test_flash_bwd_vmem_gating_by_batch():
    """Empirical compile anchors: the HD=512 single call fits at B=16 but
    overflows scoped VMEM at B>16 (Mosaic double-buffers the resident slabs)
    — large batches must head-split instead of failing to compile."""
    from daclip_tpu.ops import flash_attention as fa

    # production mid/up3 site
    assert fa._pick_qc_bwd(1024, 512, B=16) > 0
    assert fa._pick_qc_bwd(1024, 512, B=24) == 0
    assert fa._head_groups(1024, 512, 16, 16) == 1
    assert fa._head_groups(1024, 512, 16, 24) >= 2
    # down3 site (HD=256) fits either way
    assert fa._head_groups(1024, 256, 8, 16) == 1
    assert fa.flash_bwd_supported(1024, 512, 16, 24)


def test_context_free_unet_routes_L3_through_wrap_kernel(monkeypatch):
    """Kernel-shape coverage guard: with image context OFF, level 3 runs
    LinearAttention (not a SpatialTransformer), so on TPU the v5 wrap — and
    its backward — see (B, 1024, 512) at a 256² patch.  That site never
    compiles in the context-full headline configs, and its bwd overflowed the
    scoped-vmem stack at chunk=1024 (fixed: chunk halves at C>256).  Asserts
    the routing so config variants can't silently change kernel coverage
    again, and pins the bwd chunk choice at the site's shape."""
    import jax
    import jax.numpy as jnp

    from daclip_tpu.models.unet import ConditionalUNet
    from daclip_tpu.ops import linear_attention as la

    seen = []
    orig = la.attn_wrap_fused_v5
    monkeypatch.setattr(la, "attn_wrap_fused_v5",
                        lambda x, *a: seen.append(tuple(x.shape)) or orig(x, *a))
    # the wrap gates on a non-CPU backend; spoof it for the trace only
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    B, S = 2, 256
    net = ConditionalUNet(nf=64, ch_mult=(1, 2, 4, 8), context_dim=None,
                          use_degra_context=False, use_image_context=False,
                          dtype=jnp.bfloat16)
    x = jnp.zeros((B, S, S, 3), jnp.bfloat16)
    params = jax.eval_shape(
        lambda k: net.init(k, x, x, jnp.ones((B,)), None, None),
        jax.random.PRNGKey(0))
    params = jax.tree.map(lambda a: jnp.zeros(a.shape, a.dtype), params)
    jax.eval_shape(
        lambda xt: net.apply(params, xt, x, jnp.ones((B,)), None, None), x)
    assert (B, 1024, 512) in seen, seen  # the L3 site (mid + up3 reuse it)
    # the C=512 site must take the halved chunk that fits scoped VMEM:
    # budget check mirrors ops/linear_attention.py's chunk rule
    assert all(C <= 256 for (_b, _n, C) in seen if _n > 1024), seen
