"""Swin-v1 tower math + converter parity vs a torch-functional oracle.

timm is not installable here (tests/parity/EGRESS.md), so the oracle is the
Swin computation written directly in torch.nn.functional, following the
timm/Microsoft model def the reference depends on through open_clip's
TimmModel adapter branch 2 (timm_model.py:68-105 — classifier reset keeping
the network-default avg pool, bias-free adapter Linear to embed_dim):
patch-embed conv + LN → stages of windowed MHSA (learned relative-position
bias table, cyclic shift with -100 boundary mask on odd blocks) with
PatchMerging (2×2 concat in torch's x0..x3 parity order → LN(4C) →
bias-free Linear 4C→2C) between stages → final LN → token-mean pool → proj.
LayerNorm eps is the torch default 1e-5 (Swin does not override it).

Weights travel through utils/torch_convert.convert_swin_visual (via the
convert_timm_visual dispatcher) in BOTH timm layouts — classic
`layers.{i}.downsample` at the END of stage i and timm≥0.9's at the START
of stage i+1 — so this pins the flax module AND the converter schema.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from daclip_tpu.models.swin import SWIN_VARIANTS, SwinTower  # noqa: E402
from daclip_tpu.utils.torch_convert import (convert_swin_visual,  # noqa: E402
                                            convert_timm_visual)

PATCH, EMBED_DIM, IMG = 2, 8, 16           # grid 8, then 4 after merging
DEPTHS, HEADS, WINDOW, RATIO = (2, 2), (2, 4), 2, 2.0
OUT = 12

TINY = {"swin_parity_tiny": dict(patch=PATCH, embed=EMBED_DIM, depths=DEPTHS,
                                 heads=HEADS, window=WINDOW, mlp_ratio=RATIO)}


@pytest.fixture()
def tiny_variant():
    SWIN_VARIANTS.update(TINY)
    yield "swin_parity_tiny"
    del SWIN_VARIANTS["swin_parity_tiny"]


def make_state_dict(rng, layout="classic"):
    """layout='classic': downsample at the end of stage i-1;
    layout='new': downsample at the start of stage i (timm>=0.9)."""
    sd = {}
    r = lambda *s: (rng.standard_normal(s) * 0.2).astype(np.float32)
    t = "visual.trunk"
    sd[f"{t}.patch_embed.proj.weight"] = r(EMBED_DIM, 3, PATCH, PATCH)
    sd[f"{t}.patch_embed.proj.bias"] = r(EMBED_DIM)
    sd[f"{t}.patch_embed.norm.weight"] = 1 + r(EMBED_DIM) * 0.1
    sd[f"{t}.patch_embed.norm.bias"] = r(EMBED_DIM)
    for si, (depth, heads) in enumerate(zip(DEPTHS, HEADS)):
        dim = EMBED_DIM * 2 ** si
        if si > 0:
            d = (f"{t}.layers.{si - 1}.downsample" if layout == "classic"
                 else f"{t}.layers.{si}.downsample")
            sd[f"{d}.norm.weight"] = 1 + r(2 * dim) * 0.1
            sd[f"{d}.norm.bias"] = r(2 * dim)
            sd[f"{d}.reduction.weight"] = r(dim, 2 * dim)
        for bj in range(depth):
            b = f"{t}.layers.{si}.blocks.{bj}"
            for ln in ("norm1", "norm2"):
                sd[f"{b}.{ln}.weight"] = 1 + r(dim) * 0.1
                sd[f"{b}.{ln}.bias"] = r(dim)
            sd[f"{b}.attn.qkv.weight"] = r(3 * dim, dim)
            sd[f"{b}.attn.qkv.bias"] = r(3 * dim)
            sd[f"{b}.attn.proj.weight"] = r(dim, dim)
            sd[f"{b}.attn.proj.bias"] = r(dim)
            sd[f"{b}.attn.relative_position_bias_table"] = \
                r((2 * WINDOW - 1) ** 2, heads)
            sd[f"{b}.mlp.fc1.weight"] = r(int(dim * RATIO), dim)
            sd[f"{b}.mlp.fc1.bias"] = r(int(dim * RATIO))
            sd[f"{b}.mlp.fc2.weight"] = r(dim, int(dim * RATIO))
            sd[f"{b}.mlp.fc2.bias"] = r(dim)
    final = EMBED_DIM * 2 ** (len(DEPTHS) - 1)
    sd[f"{t}.norm.weight"] = 1 + r(final) * 0.1
    sd[f"{t}.norm.bias"] = r(final)
    sd["visual.head.proj.weight"] = r(OUT, final)
    return sd


def torch_oracle(sd, x_nchw):
    import torch.nn.functional as F
    T = lambda k: torch.from_numpy(sd[k])
    t, w = "visual.trunk", WINDOW
    ln = lambda x, key: F.layer_norm(x, (x.shape[-1],), T(f"{key}.weight"),
                                     T(f"{key}.bias"))  # torch default eps

    # relative-position index, Swin construction
    coords = torch.stack(torch.meshgrid(torch.arange(w), torch.arange(w),
                                        indexing="ij")).flatten(1)
    rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
    rel = rel + (w - 1)
    rel_index = (rel[..., 0] * (2 * w - 1) + rel[..., 1]).reshape(-1)

    def window_attn(x, b, heads, mask):
        # x: (B, G, G, C) -> windows -> MHSA -> (B, G, G, C)
        B, G, _, C = x.shape
        hd = C // heads
        xw = x.reshape(B, G // w, w, G // w, w, C).permute(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(-1, w * w, C)
        nB, N, _ = xw.shape
        qkv = F.linear(xw, T(f"{b}.attn.qkv.weight"), T(f"{b}.attn.qkv.bias"))
        q, k, v = qkv.reshape(nB, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
        a = (q * hd ** -0.5) @ k.transpose(-2, -1)          # (nB, H, N, N)
        table = T(f"{b}.attn.relative_position_bias_table")
        bias = table[rel_index].reshape(N, N, heads).permute(2, 0, 1)
        a = a + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            a = a.reshape(nB // nW, nW, heads, N, N) + mask[None, :, None]
            a = a.reshape(nB, heads, N, N)
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(nB, N, C)
        o = F.linear(o, T(f"{b}.attn.proj.weight"), T(f"{b}.attn.proj.bias"))
        o = o.reshape(B, G // w, G // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
        return o.reshape(B, G, G, C)

    def shift_mask(G, shift):
        img = torch.zeros(G, G)
        cnt = 0
        for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
                img[hs, ws] = cnt
                cnt += 1
        wins = img.reshape(G // w, w, G // w, w).permute(0, 2, 1, 3)
        wins = wins.reshape(-1, w * w)
        diff = wins.unsqueeze(2) - wins.unsqueeze(1)
        return diff.masked_fill(diff != 0, -100.0)

    x = F.conv2d(x_nchw, T(f"{t}.patch_embed.proj.weight"),
                 T(f"{t}.patch_embed.proj.bias"), stride=PATCH)
    x = ln(x.permute(0, 2, 3, 1), f"{t}.patch_embed.norm")   # (B, G, G, C)
    for si, (depth, heads) in enumerate(zip(DEPTHS, HEADS)):
        dim = EMBED_DIM * 2 ** si
        if si > 0:
            # PatchMerging: torch order cat([x0, x1, x2, x3])
            d = (f"{t}.layers.{si - 1}.downsample"
                 if f"{t}.layers.{si - 1}.downsample.norm.weight" in sd
                 else f"{t}.layers.{si}.downsample")
            x0 = x[:, 0::2, 0::2]
            x1 = x[:, 1::2, 0::2]
            x2 = x[:, 0::2, 1::2]
            x3 = x[:, 1::2, 1::2]
            x = torch.cat([x0, x1, x2, x3], dim=-1)
            x = ln(x, f"{d}.norm")
            x = F.linear(x, T(f"{d}.reduction.weight"))
        G = x.shape[1]
        for bj in range(depth):
            b = f"{t}.layers.{si}.blocks.{bj}"
            shift = 0 if (bj % 2 == 0 or G <= w) else w // 2
            shortcut = x
            y = ln(x, f"{b}.norm1")
            if shift:
                y = torch.roll(y, (-shift, -shift), dims=(1, 2))
            y = window_attn(y, b, heads,
                            shift_mask(G, shift) if shift else None)
            if shift:
                y = torch.roll(y, (shift, shift), dims=(1, 2))
            x = shortcut + y
            z = ln(x, f"{b}.norm2")
            z = F.gelu(F.linear(z, T(f"{b}.mlp.fc1.weight"),
                                T(f"{b}.mlp.fc1.bias")))  # erf
            x = x + F.linear(z, T(f"{b}.mlp.fc2.weight"), T(f"{b}.mlp.fc2.bias"))
    x = ln(x, f"{t}.norm")
    x = x.flatten(1, 2).mean(1)                              # avg pool
    return F.linear(x, torch.from_numpy(sd["visual.head.proj.weight"]))


@pytest.mark.regression_test
@pytest.mark.parametrize("layout", ["classic", "new"])
def test_swin_tower_matches_torch_oracle(tiny_variant, layout):
    rng = np.random.default_rng(7)
    sd = make_state_dict(rng, layout=layout)
    params = convert_swin_visual(sd)
    x = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)

    want = torch_oracle(sd, torch.from_numpy(x)).numpy()
    tower = SwinTower(model_name=tiny_variant, embed_dim=OUT, image_size=IMG)
    got = np.asarray(tower.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_convert_timm_visual_dispatches_swin(tiny_variant):
    sd = make_state_dict(np.random.default_rng(1))
    a = convert_timm_visual(sd)
    b = convert_swin_visual(sd)
    assert set(a) == set(b)
    np.testing.assert_array_equal(a["stage0_block0"]["attn"]["qkv"]["kernel"],
                                  b["stage0_block0"]["attn"]["qkv"]["kernel"])
