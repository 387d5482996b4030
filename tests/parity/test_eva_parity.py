"""EVA / EVA-02 tower math + converter parity vs a torch-functional oracle.

timm is not installable here (tests/parity/EGRESS.md), so the oracle is the
EVA computation written directly in torch.nn.functional, following timm's
`eva.py` model semantics the reference depends on through open_clip's
TimmModel adapter branch 1 (timm_model.py:58-67 — num_classes=embed_dim,
global_pool='token', the trunk head IS the projection):

  * BEiT-style fused qkv (single (3D, D) Linear, learnable q/v biases,
    constant-zero k bias) vs split q/k/v (k bias-free),
  * 2-D axial rotary embedding (RotaryEmbeddingCat semantics: per-axis
    freq bands 1/T^(i/nb), nb=head_dim/4, integer coords rescaled to
    ref_feat_shape, sin/cos repeat-interleaved ×2; cls token excluded),
  * EVA-CLIP extras: inner LN over concatenated heads before attn.proj
    ("scale_attn_inner") + SwiGLU MLP with a sub-LN before fc2 ("scale_mlp"),
  * post-norm blocks (residual adds the LayerNorm OF the sublayer output —
    the eva02_enormous schema).

Weights travel through utils/torch_convert.convert_eva_visual (via the
convert_timm_visual dispatcher), so this pins the flax module AND the
converter key schema at once.  The oracle's rope tables are built
independently in torch (not by importing models/eva.rope_tables) so table
construction itself is cross-checked.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from daclip_tpu.models.eva import EVA_VARIANTS, EvaTower  # noqa: E402
from daclip_tpu.utils.torch_convert import (convert_eva_visual,  # noqa: E402
                                            convert_timm_visual)

WIDTH, DEPTH, HEADS, EMBED = 32, 2, 4, 24
PATCH, IMG = 4, 16  # 4x4 grid

TINY = {
    "eva_parity_fused": dict(
        patch=PATCH, width=WIDTH, depth=DEPTH, heads=HEADS, hidden=64,
        swiglu=False, clip_extras=False, rope=False, post_norm=False,
        fused_qkv=True, ref_feat=None),
    "eva_parity_clip": dict(
        patch=PATCH, width=WIDTH, depth=DEPTH, heads=HEADS, hidden=48,
        swiglu=True, clip_extras=True, rope=True, post_norm=False,
        fused_qkv=False, ref_feat=(8, 8)),
    "eva_parity_postnorm": dict(
        patch=PATCH, width=WIDTH, depth=DEPTH, heads=HEADS, hidden=64,
        swiglu=False, clip_extras=False, rope=False, post_norm=True,
        fused_qkv=True, ref_feat=None),
}


@pytest.fixture()
def tiny_variants():
    EVA_VARIANTS.update(TINY)
    yield
    for k in TINY:
        del EVA_VARIANTS[k]


def make_state_dict(rng, cfg):
    sd = {}
    r = lambda *s: (rng.standard_normal(s) * 0.2).astype(np.float32)
    t, D, hid = "visual.trunk", cfg["width"], cfg["hidden"]
    sd[f"{t}.patch_embed.proj.weight"] = r(D, 3, cfg["patch"], cfg["patch"])
    sd[f"{t}.patch_embed.proj.bias"] = r(D)
    sd[f"{t}.cls_token"] = r(1, 1, D)
    n = (IMG // cfg["patch"]) ** 2
    sd[f"{t}.pos_embed"] = r(1, n + 1, D)
    for i in range(cfg["depth"]):
        b = f"{t}.blocks.{i}"
        for ln in ("norm1", "norm2"):
            sd[f"{b}.{ln}.weight"] = 1 + r(D) * 0.1
            sd[f"{b}.{ln}.bias"] = r(D)
        if cfg["fused_qkv"]:
            sd[f"{b}.attn.qkv.weight"] = r(3 * D, D)
            sd[f"{b}.attn.q_bias"] = r(D)
            sd[f"{b}.attn.v_bias"] = r(D)
        else:
            sd[f"{b}.attn.q_proj.weight"] = r(D, D)
            sd[f"{b}.attn.q_proj.bias"] = r(D)
            sd[f"{b}.attn.k_proj.weight"] = r(D, D)
            sd[f"{b}.attn.v_proj.weight"] = r(D, D)
            sd[f"{b}.attn.v_proj.bias"] = r(D)
        if cfg["clip_extras"]:
            sd[f"{b}.attn.norm.weight"] = 1 + r(D) * 0.1
            sd[f"{b}.attn.norm.bias"] = r(D)
            sd[f"{b}.mlp.norm.weight"] = 1 + r(hid) * 0.1
            sd[f"{b}.mlp.norm.bias"] = r(hid)
        sd[f"{b}.attn.proj.weight"] = r(D, D)
        sd[f"{b}.attn.proj.bias"] = r(D)
        if cfg["swiglu"]:
            sd[f"{b}.mlp.fc1_g.weight"] = r(hid, D)
            sd[f"{b}.mlp.fc1_g.bias"] = r(hid)
            sd[f"{b}.mlp.fc1_x.weight"] = r(hid, D)
            sd[f"{b}.mlp.fc1_x.bias"] = r(hid)
        else:
            sd[f"{b}.mlp.fc1.weight"] = r(hid, D)
            sd[f"{b}.mlp.fc1.bias"] = r(hid)
        sd[f"{b}.mlp.fc2.weight"] = r(D, hid)
        sd[f"{b}.mlp.fc2.bias"] = r(D)
    sd[f"{t}.norm.weight"] = 1 + r(D) * 0.1
    sd[f"{t}.norm.bias"] = r(D)
    sd[f"{t}.head.weight"] = r(EMBED, D)
    sd[f"{t}.head.bias"] = r(EMBED)
    return sd


def torch_rope(grid, head_dim, ref_feat, temperature=10000.0):
    """Independent torch build of timm's RotaryEmbeddingCat tables
    (in_pixels=False): returns (sin, cos), each (N, head_dim)."""
    nb = head_dim // 4
    bands = 1.0 / (temperature
                   ** (torch.arange(nb, dtype=torch.float64) / nb))
    ts = []
    for i, s in enumerate(grid):
        t = torch.arange(s, dtype=torch.float64)
        if ref_feat is not None:
            t = t / s * ref_feat[i]
        ts.append(t)
    g = torch.stack(torch.meshgrid(ts[0], ts[1], indexing="ij"), dim=-1)
    pos = (g.unsqueeze(-1) * bands).reshape(-1, 2 * nb)
    sin = torch.repeat_interleave(torch.sin(pos), 2, dim=-1).float()
    cos = torch.repeat_interleave(torch.cos(pos), 2, dim=-1).float()
    return sin, cos


def torch_oracle(sd, x_nchw, cfg):
    import torch.nn.functional as F
    T = lambda k: torch.from_numpy(sd[k])
    t, D, H = "visual.trunk", cfg["width"], cfg["heads"]
    hd = D // H
    EPS = 1e-6
    ln = lambda x, key: F.layer_norm(x, (x.shape[-1],), T(f"{key}.weight"),
                                     T(f"{key}.bias"), eps=EPS)

    x = F.conv2d(x_nchw, T(f"{t}.patch_embed.proj.weight"),
                 T(f"{t}.patch_embed.proj.bias"), stride=cfg["patch"])
    B, _, gh, gw = x.shape
    x = x.flatten(2).transpose(1, 2)                       # (B, N, D)
    cls = T(f"{t}.cls_token").expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + T(f"{t}.pos_embed")

    rope = None
    if cfg["rope"]:
        rope = torch_rope((gh, gw), hd, cfg["ref_feat"])

    def rot(y):  # timm apply_rot_embed_cat rotate-half with interleaved pairs
        return torch.stack([-y[..., 1::2], y[..., 0::2]], -1).reshape(y.shape)

    def attn(y, b):
        N = y.shape[1]
        if cfg["fused_qkv"]:
            bias = torch.cat([T(f"{b}.attn.q_bias"),
                              torch.zeros(D), T(f"{b}.attn.v_bias")])
            qkv = F.linear(y, T(f"{b}.attn.qkv.weight"), bias)
            q, k, v = qkv.chunk(3, dim=-1)
        else:
            q = F.linear(y, T(f"{b}.attn.q_proj.weight"),
                         T(f"{b}.attn.q_proj.bias"))
            k = F.linear(y, T(f"{b}.attn.k_proj.weight"))
            v = F.linear(y, T(f"{b}.attn.v_proj.weight"),
                         T(f"{b}.attn.v_proj.bias"))
        q = q.reshape(B, N, H, hd).transpose(1, 2)          # (B, H, N, hd)
        k = k.reshape(B, N, H, hd).transpose(1, 2)
        v = v.reshape(B, N, H, hd).transpose(1, 2)
        if rope is not None:
            sin, cos = rope
            q = torch.cat([q[:, :, :1],
                           q[:, :, 1:] * cos + rot(q[:, :, 1:]) * sin], dim=2)
            k = torch.cat([k[:, :, :1],
                           k[:, :, 1:] * cos + rot(k[:, :, 1:]) * sin], dim=2)
        a = (q * hd ** -0.5) @ k.transpose(-2, -1)
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(B, N, D)
        if cfg["clip_extras"]:
            o = ln(o, f"{b}.attn.norm")
        return F.linear(o, T(f"{b}.attn.proj.weight"), T(f"{b}.attn.proj.bias"))

    def mlp(y, b):
        if cfg["swiglu"]:
            g = F.linear(y, T(f"{b}.mlp.fc1_g.weight"), T(f"{b}.mlp.fc1_g.bias"))
            h = F.linear(y, T(f"{b}.mlp.fc1_x.weight"), T(f"{b}.mlp.fc1_x.bias"))
            y = F.silu(g) * h
        else:
            y = F.gelu(F.linear(y, T(f"{b}.mlp.fc1.weight"),
                                T(f"{b}.mlp.fc1.bias")))  # erf
        if cfg["clip_extras"]:
            y = ln(y, f"{b}.mlp.norm")
        return F.linear(y, T(f"{b}.mlp.fc2.weight"), T(f"{b}.mlp.fc2.bias"))

    for i in range(cfg["depth"]):
        b = f"{t}.blocks.{i}"
        if cfg["post_norm"]:
            x = x + ln(attn(x, b), f"{b}.norm1")
            x = x + ln(mlp(x, b), f"{b}.norm2")
        else:
            x = x + attn(ln(x, f"{b}.norm1"), b)
            x = x + mlp(ln(x, f"{b}.norm2"), b)
    x = ln(x, f"{t}.norm")[:, 0]
    return F.linear(x, T(f"{t}.head.weight"), T(f"{t}.head.bias"))


@pytest.mark.regression_test
@pytest.mark.parametrize("variant", sorted(TINY))
def test_eva_tower_matches_torch_oracle(tiny_variants, variant):
    cfg = TINY[variant]
    rng = np.random.default_rng(hash(variant) % 2 ** 31)
    sd = make_state_dict(rng, cfg)
    params = convert_eva_visual(sd)
    x = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)

    want = torch_oracle(sd, torch.from_numpy(x), cfg).numpy()
    tower = EvaTower(model_name=variant, embed_dim=EMBED, image_size=IMG)
    got = np.asarray(tower.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_full_custom_text_checkpoint_loads_through_factory(tiny_variants,
                                                           tmp_path):
    """An open_clip CustomTextCLIP checkpoint (visual.trunk EVA + `text.`-
    prefixed text tower — the layout of every timm-family release,
    model.py:267-285) loads end-to-end via create_model(pretrained=...)."""
    import jax.numpy as jnp2

    from daclip_tpu.factory import create_model
    from daclip_tpu.models.clip import _MODEL_CONFIGS

    cfg = TINY["eva_parity_clip"]
    rng = np.random.default_rng(3)
    sd = make_state_dict(rng, cfg)
    r = lambda *s: (rng.standard_normal(s) * 0.1).astype(np.float32)
    TW, TL, CTX, VOC = 32, 2, 8, 64
    sd["text.token_embedding.weight"] = r(VOC, TW)
    sd["text.positional_embedding"] = r(CTX, TW)
    sd["text.ln_final.weight"] = 1 + r(TW) * 0.1
    sd["text.ln_final.bias"] = r(TW)
    sd["text.text_projection"] = r(TW, EMBED)
    for i in range(TL):
        b = f"text.transformer.resblocks.{i}"
        for ln in ("ln_1", "ln_2"):
            sd[f"{b}.{ln}.weight"] = 1 + r(TW) * 0.1
            sd[f"{b}.{ln}.bias"] = r(TW)
        sd[f"{b}.attn.in_proj_weight"] = r(3 * TW, TW)
        sd[f"{b}.attn.in_proj_bias"] = r(3 * TW)
        sd[f"{b}.attn.out_proj.weight"] = r(TW, TW)
        sd[f"{b}.attn.out_proj.bias"] = r(TW)
        sd[f"{b}.mlp.c_fc.weight"] = r(4 * TW, TW)
        sd[f"{b}.mlp.c_fc.bias"] = r(4 * TW)
        sd[f"{b}.mlp.c_proj.weight"] = r(TW, 4 * TW)
        sd[f"{b}.mlp.c_proj.bias"] = r(TW)
    sd["logit_scale"] = np.asarray(2.6593, np.float32)
    path = tmp_path / "eva_tiny.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(path))

    _MODEL_CONFIGS["eva-parity-tiny"] = {
        "embed_dim": EMBED,
        "vision_cfg": {"image_size": IMG,
                       "timm_model_name": "eva_parity_clip",
                       "timm_pool": "token", "timm_proj": None},
        "text_cfg": {"context_length": CTX, "vocab_size": VOC,
                     "width": TW, "heads": 4, "layers": TL},
        "custom_text": True,
    }
    try:
        m, p = create_model("eva-parity-tiny", pretrained=str(path))
        x = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
        img = jnp2.asarray(np.transpose(x, (0, 2, 3, 1)))
        feats = m.apply({"params": p}, img, method=m.encode_image)
        # the loaded visual params reproduce the oracle forward exactly
        want = torch_oracle(sd, torch.from_numpy(x), cfg).numpy()
        np.testing.assert_allclose(np.asarray(feats), want,
                                   rtol=3e-5, atol=3e-5)
        txt = jnp2.asarray((np.arange(2 * CTX).reshape(2, CTX) % VOC)
                           .astype(np.int32))
        tf = m.apply({"params": p}, txt, method=m.encode_text)
        assert tf.shape == (2, EMBED)
        assert np.isfinite(np.asarray(tf)).all()
    finally:
        del _MODEL_CONFIGS["eva-parity-tiny"]


def test_convert_timm_visual_dispatches_eva(tiny_variants):
    rng = np.random.default_rng(0)
    for variant in ("eva_parity_fused", "eva_parity_clip"):
        sd = make_state_dict(rng, TINY[variant])
        a = convert_timm_visual(sd)
        b = convert_eva_visual(sd)
        np.testing.assert_array_equal(a["patch_embed"], b["patch_embed"])
        assert set(a["blocks"]) == set(b["blocks"])
