"""Plain-timm ViT tower math + converter parity vs a torch-functional oracle.

timm is not installable here (tests/parity/EGRESS.md), so the oracle is the
computation written directly in torch.nn.functional, following the timm
model defs the reference depends on through open_clip's TimmModel adapter
branch 2 (timm_model.py:68-105 — classifier reset keeping the
network-default pooling, bias-free adapter Linear to embed_dim):

  * VisionTransformer (vit_*_gap_*): no class token, abs pos embed,
    bias-free qkv, LayerScale, final norm BEFORE global average pooling
    (fc_norm=False in the vendored model def).
  * VisionTransformerRelPos (vit_relpos_*_cls_*): class token + 'token'
    pooling, LayerScale (init_values=1e-6 is the class default), NO abs pos
    embed; per-block RelPosMlp bias (mode='cr': signed-log relative coords →
    Linear(2,rel_pos_dim) → ReLU → Linear(rel_pos_dim,heads), gathered by
    the standard relative index, zero-padded over the cls prefix).

Weights travel through utils/torch_convert.convert_timm_vit_visual (via the
convert_timm_visual dispatcher), pinning module AND converter schema.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from daclip_tpu.models.timm_vit import (TIMM_VIT_VARIANTS,  # noqa: E402
                                        TimmViTTower)
from daclip_tpu.utils.torch_convert import (convert_timm_visual,  # noqa: E402
                                            convert_timm_vit_visual)

WIDTH, DEPTH, HEADS, OUT = 32, 2, 4, 24
PATCH, IMG = 4, 16  # grid 4

TINY = {
    "vit_parity_gap": dict(
        patch=PATCH, width=WIDTH, depth=DEPTH, heads=HEADS, mlp_ratio=2.0,
        qkv_bias=False, class_token=False, pool="avg", ls_init=1e-1,
        relpos=False),
    "vit_parity_relpos": dict(
        patch=PATCH, width=WIDTH, depth=DEPTH, heads=HEADS, mlp_ratio=2.0,
        qkv_bias=False, class_token=True, pool="token", ls_init=1e-1,
        relpos=True, rel_pos_dim=48),
}


@pytest.fixture()
def tiny_variants():
    TIMM_VIT_VARIANTS.update(TINY)
    yield
    for k in TINY:
        del TIMM_VIT_VARIANTS[k]


def make_state_dict(rng, cfg):
    sd = {}
    r = lambda *s: (rng.standard_normal(s) * 0.2).astype(np.float32)
    t, D = "visual.trunk", cfg["width"]
    hid = int(D * cfg["mlp_ratio"])
    sd[f"{t}.patch_embed.proj.weight"] = r(D, 3, cfg["patch"], cfg["patch"])
    sd[f"{t}.patch_embed.proj.bias"] = r(D)
    n = (IMG // cfg["patch"]) ** 2
    if cfg["class_token"]:
        sd[f"{t}.cls_token"] = r(1, 1, D)
    if not cfg["relpos"]:
        sd[f"{t}.pos_embed"] = r(1, n + int(cfg["class_token"]), D)
    for i in range(cfg["depth"]):
        b = f"{t}.blocks.{i}"
        for ln in ("norm1", "norm2"):
            sd[f"{b}.{ln}.weight"] = 1 + r(D) * 0.1
            sd[f"{b}.{ln}.bias"] = r(D)
        sd[f"{b}.attn.qkv.weight"] = r(3 * D, D)
        if cfg["qkv_bias"]:
            sd[f"{b}.attn.qkv.bias"] = r(3 * D)
        sd[f"{b}.attn.proj.weight"] = r(D, D)
        sd[f"{b}.attn.proj.bias"] = r(D)
        if cfg["ls_init"] is not None:
            sd[f"{b}.ls1.gamma"] = cfg["ls_init"] + r(D) * 0.01
            sd[f"{b}.ls2.gamma"] = cfg["ls_init"] + r(D) * 0.01
        if cfg["relpos"]:
            rpd = cfg["rel_pos_dim"]
            sd[f"{b}.attn.rel_pos.mlp.fc1.weight"] = r(rpd, 2)
            sd[f"{b}.attn.rel_pos.mlp.fc1.bias"] = r(rpd)
            sd[f"{b}.attn.rel_pos.mlp.fc2.weight"] = r(HEADS, rpd)
            sd[f"{b}.attn.rel_pos.mlp.fc2.bias"] = r(HEADS)
        sd[f"{b}.mlp.fc1.weight"] = r(hid, D)
        sd[f"{b}.mlp.fc1.bias"] = r(hid)
        sd[f"{b}.mlp.fc2.weight"] = r(D, hid)
        sd[f"{b}.mlp.fc2.bias"] = r(D)
    sd[f"{t}.norm.weight"] = 1 + r(D) * 0.1
    sd[f"{t}.norm.bias"] = r(D)
    sd["visual.head.proj.weight"] = r(OUT, D)
    return sd


def torch_oracle(sd, x_nchw, cfg):
    import torch.nn.functional as F
    T = lambda k: torch.from_numpy(sd[k])
    t, D, H = "visual.trunk", cfg["width"], cfg["heads"]
    hd = D // H
    ln = lambda x, key: F.layer_norm(x, (x.shape[-1],), T(f"{key}.weight"),
                                     T(f"{key}.bias"), eps=1e-6)

    x = F.conv2d(x_nchw, T(f"{t}.patch_embed.proj.weight"),
                 T(f"{t}.patch_embed.proj.bias"), stride=cfg["patch"])
    B, _, g, _ = x.shape
    x = x.flatten(2).transpose(1, 2)
    prefix = 0
    if cfg["class_token"]:
        x = torch.cat([T(f"{t}.cls_token").expand(B, -1, -1), x], dim=1)
        prefix = 1
    if not cfg["relpos"]:
        x = x + T(f"{t}.pos_embed")

    rel_bias_tables = None
    if cfg["relpos"]:
        # signed-log relative coords (timm gen_relative_log_coords, mode='cr')
        r = torch.arange(-(g - 1), g, dtype=torch.float32)
        ch, cw = torch.meshgrid(r, r, indexing="ij")
        table = torch.stack([ch, cw], dim=-1).reshape(-1, 2)
        coords = torch.sign(table) * torch.log1p(table.abs())
        # standard relative index
        cg = torch.stack(torch.meshgrid(torch.arange(g), torch.arange(g),
                                        indexing="ij")).flatten(1)
        rel = (cg[:, :, None] - cg[:, None, :]).permute(1, 2, 0) + (g - 1)
        index = (rel[..., 0] * (2 * g - 1) + rel[..., 1]).reshape(-1)
        rel_bias_tables = (coords, index)

    def attn(y, b):
        N = y.shape[1]
        qkv = F.linear(y, T(f"{b}.attn.qkv.weight"),
                       T(f"{b}.attn.qkv.bias") if cfg["qkv_bias"] else None)
        q, k, v = qkv.reshape(B, N, 3, H, hd).permute(2, 0, 3, 1, 4)
        a = (q * hd ** -0.5) @ k.transpose(-2, -1)
        if cfg["relpos"]:
            coords, index = rel_bias_tables
            h1 = F.relu(F.linear(coords, T(f"{b}.attn.rel_pos.mlp.fc1.weight"),
                                 T(f"{b}.attn.rel_pos.mlp.fc1.bias")))
            tab = F.linear(h1, T(f"{b}.attn.rel_pos.mlp.fc2.weight"),
                           T(f"{b}.attn.rel_pos.mlp.fc2.bias"))
            npatch = N - prefix
            bias = tab[index].reshape(npatch, npatch, H).permute(2, 0, 1)
            bias = F.pad(bias, [prefix, 0, prefix, 0])
            a = a + bias.unsqueeze(0)
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(B, N, D)
        return F.linear(o, T(f"{b}.attn.proj.weight"), T(f"{b}.attn.proj.bias"))

    def mlp(y, b):
        y = F.gelu(F.linear(y, T(f"{b}.mlp.fc1.weight"),
                            T(f"{b}.mlp.fc1.bias")))  # erf
        return F.linear(y, T(f"{b}.mlp.fc2.weight"), T(f"{b}.mlp.fc2.bias"))

    for i in range(cfg["depth"]):
        b = f"{t}.blocks.{i}"
        ya = attn(ln(x, f"{b}.norm1"), b)
        if cfg["ls_init"] is not None:
            ya = ya * T(f"{b}.ls1.gamma")
        x = x + ya
        ym = mlp(ln(x, f"{b}.norm2"), b)
        if cfg["ls_init"] is not None:
            ym = ym * T(f"{b}.ls2.gamma")
        x = x + ym
    x = ln(x, f"{t}.norm")
    x = x[:, 0] if cfg["pool"] == "token" else x.mean(1)
    return F.linear(x, torch.from_numpy(sd["visual.head.proj.weight"]))


@pytest.mark.regression_test
@pytest.mark.parametrize("variant", sorted(TINY))
def test_timm_vit_tower_matches_torch_oracle(tiny_variants, variant):
    cfg = TINY[variant]
    rng = np.random.default_rng(hash(variant) % 2 ** 31)
    sd = make_state_dict(rng, cfg)
    params = convert_timm_vit_visual(sd)
    x = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)

    want = torch_oracle(sd, torch.from_numpy(x), cfg).numpy()
    tower = TimmViTTower(model_name=variant, embed_dim=OUT, image_size=IMG)
    got = np.asarray(tower.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_convert_timm_visual_dispatches_vit(tiny_variants):
    sd = make_state_dict(np.random.default_rng(2), TINY["vit_parity_gap"])
    a = convert_timm_visual(sd)
    b = convert_timm_vit_visual(sd)
    assert set(a) == set(b)
    np.testing.assert_array_equal(a["blocks"]["qkv"]["kernel"],
                                  b["blocks"]["qkv"]["kernel"])


def test_relpos_registry_matches_real_checkpoint_when_available():
    """The rel_pos_dim registry constant (256 for the medium cls variant —
    timm vision_transformer_relpos.py model def; unverifiable live under zero
    egress) against any REAL checkpoint on this host: skipped until one is
    downloadable, then pins the constant to the shipped weights."""
    import glob
    import os

    candidates = sorted(
        glob.glob(os.path.join("pretrained", "*.pt"))
        + glob.glob(os.path.expanduser("~/.cache/clip/*.pt")))
    fc1_key = "visual.trunk.blocks.0.attn.rel_pos.mlp.fc1.weight"
    checked = 0
    for path in candidates:
        try:
            sd = torch.load(path, map_location="cpu")
        except Exception:
            continue
        sd = sd.get("state_dict", sd)
        if fc1_key not in sd:
            continue
        want = TIMM_VIT_VARIANTS["vit_relpos_medium_patch16_cls_224"][
            "rel_pos_dim"]
        assert sd[fc1_key].shape[0] == want, (
            f"{path}: checkpoint RelPosMlp width {sd[fc1_key].shape[0]} != "
            f"registry rel_pos_dim {want} — fix TIMM_VIT_VARIANTS")
        checked += 1
    if not checked:
        pytest.skip("no relpos timm checkpoint on this host (zero egress; "
                    "see tests/parity/EGRESS.md)")
