"""Native flax ConvNeXt vision tower (models/convnext.py) — makes the vendored
convnext_* model configs buildable (reference wraps timm: timm_model.py:28-149).

No timm/torchvision exists in this image to golden-compare against, so the
architecture check is exact parameter-count parity with timm's convnext_tiny
(28,589,128 published total minus the 768x1000+1000 classifier = 27,820,128)
plus structural/shape/behavioral checks.
"""
import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daclip_tpu.factory import create_model
from daclip_tpu.models.convnext import VARIANTS, ConvNeXtTower, build_timm_tower

CONFIG_DIR = (pathlib.Path(__file__).resolve().parents[1]
              / "daclip_tpu" / "assets" / "model_configs")


def test_all_vendored_convnext_configs_are_buildable():
    """Every convnext_* JSON names a variant the native tower implements."""
    found = 0
    for p in sorted(CONFIG_DIR.glob("convnext_*.json")):
        cfg = json.loads(p.read_text())
        name = cfg["vision_cfg"]["timm_model_name"]
        assert name in VARIANTS, f"{p.name}: no native variant {name!r}"
        assert cfg["vision_cfg"]["timm_pool"] in ("", "avg")
        assert cfg["vision_cfg"]["timm_proj"] in ("linear", "mlp")
        found += 1
    assert found >= 11  # the full vendored convnext family


def test_convnext_tiny_builds_and_encodes():
    model, params = create_model("convnext_tiny")
    # timm convnext_tiny param parity: 28,589,128 total - classifier = 27,820,128
    trunk = params["visual"]["trunk"]
    n = sum(x.size for x in jax.tree.leaves(trunk))
    assert n == 27_820_128, n
    img = jnp.ones((2, 224, 224, 3))
    f = model.apply({"params": params}, img, normalize=True,
                    method=model.encode_image)
    assert f.shape == (2, model.cfg.embed_dim)
    assert np.isfinite(np.asarray(f)).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(f), axis=-1), 1.0,
                               rtol=1e-5)


def test_convnext_mlp_projection():
    """convnext_large_d-style head: Mlp(prev, 2*embed, embed, bias=(True, False))."""
    tower = ConvNeXtTower(model_name="convnext_tiny", embed_dim=64, proj="mlp")
    x = jnp.ones((1, 64, 64, 3))
    params = tower.init(jax.random.PRNGKey(0), x)["params"]
    assert params["mlp_fc1"]["kernel"].shape == (768, 128)
    assert "bias" in params["mlp_fc1"]
    assert params["mlp_fc2"]["kernel"].shape == (128, 64)
    assert "bias" not in params["mlp_fc2"]
    out = tower.apply({"params": params}, x)
    assert out.shape == (1, 64)


def test_convnext_stochastic_depth_gated_on_rng():
    tower = ConvNeXtTower(model_name="convnext_tiny", embed_dim=32,
                          drop_path=0.5)
    x = jnp.linspace(0, 1, 64 * 64 * 3).reshape(1, 64, 64, 3)
    params = tower.init(jax.random.PRNGKey(0), x)["params"]
    eval_out = tower.apply({"params": params}, x)
    # train WITHOUT a drop_path rng: stochastic depth stays off (harness mode)
    same = tower.apply({"params": params}, x, train=True)
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(same))
    # train WITH the rng: branches actually drop
    diff = tower.apply({"params": params}, x, train=True,
                       rngs={"drop_path": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(eval_out), np.asarray(diff))


def test_timm_tower_dispatch_and_gate():
    # every vendored family now builds natively (models/{eva,swin,timm_vit}.py)
    from daclip_tpu.models.eva import EvaTower
    from daclip_tpu.models.swin import SwinTower
    from daclip_tpu.models.timm_vit import TimmViTTower
    assert isinstance(build_timm_tower("eva02_base_patch16_clip_224", 512,
                                       pool="token", proj=None), EvaTower)
    assert isinstance(build_timm_tower("swin_base_patch4_window7_224", 512),
                      SwinTower)
    assert isinstance(build_timm_tower("vit_medium_patch16_gap_256", 512),
                      TimmViTTower)
    # unknown timm archs still gate with migration guidance
    with pytest.raises(ImportError, match="timm"):
        build_timm_tower("resnet50", 512)
    # EVA towers enforce the vendored configs' adapter branch
    with pytest.raises(ValueError, match="token"):
        build_timm_tower("eva02_base_patch16_clip_224", 512)


def test_timm_tower_remat_grads_match():
    """--grad-checkpointing on timm towers: remat recompute changes memory,
    not math (TimmModel.set_grad_checkpointing parity)."""
    import numpy as np

    from daclip_tpu.models.convnext import VARIANTS, ConvNeXtTower
    from daclip_tpu.models.eva import EVA_VARIANTS, EvaTower
    VARIANTS["cn_remat_t"] = ((2, 2), (16, 32))
    EVA_VARIANTS["eva_remat_t"] = dict(
        patch=4, width=32, depth=2, heads=4, hidden=64, swiglu=True,
        clip_extras=True, rope=True, post_norm=False, fused_qkv=False,
        ref_feat=(8, 8))
    try:
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((2, 16, 16, 3)), jnp.float32)
        for cls, kw in [(ConvNeXtTower, dict(model_name="cn_remat_t")),
                        (EvaTower, dict(model_name="eva_remat_t",
                                        image_size=16))]:
            t0 = cls(embed_dim=8, **kw)
            t1 = cls(embed_dim=8, remat=True, **kw)
            p = t0.init(jax.random.PRNGKey(0), x)["params"]
            loss = lambda m: lambda pp: jnp.sum(m.apply({"params": pp}, x) ** 2)
            g0, g1 = jax.grad(loss(t0))(p), jax.grad(loss(t1))(p)
            for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-4)
    finally:
        del VARIANTS["cn_remat_t"]
        del EVA_VARIANTS["eva_remat_t"]


def test_convnext_rejects_controller_use():
    tower = ConvNeXtTower(model_name="convnext_tiny", embed_dim=32)
    x = jnp.ones((1, 64, 64, 3))
    params = tower.init(jax.random.PRNGKey(0), x)["params"]
    with pytest.raises(AssertionError, match="ViT"):
        tower.apply({"params": params}, x, output_hiddens=True)
