"""Standalone shape/behaviour tests for the model library (tiny configs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daclip_tpu.models import CLIP, CLIPCfg, DaCLIP, TextCfg, VisionCfg
from daclip_tpu.models.clip import MultiTypeDegradationPredictor
from daclip_tpu.models.unet import ConditionalUNet

TINY = CLIPCfg(
    embed_dim=32,
    vision=VisionCfg(image_size=32, patch_size=16, width=64, layers=2, head_width=32),
    text=TextCfg(context_length=16, vocab_size=128, width=32, heads=2, layers=2),
)


@pytest.fixture(scope="module")
def tiny_daclip():
    model = DaCLIP(TINY, use_predictor=True)
    img = jnp.zeros((2, 32, 32, 3))
    txt = jnp.zeros((2, 32), jnp.int32)
    toks = jnp.zeros((28, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), image=img, text=txt,
                        gt_images=img, deg_type=jnp.ones((2, 4)),
                        gt_val=jnp.ones((2, 4)),
                        bin_center_bank=jnp.ones((4, 7)),
                        all_d_type_tokens=toks)
    return model, params


def test_clip_encode_shapes():
    model = CLIP(TINY)
    img = jnp.zeros((2, 32, 32, 3))
    txt = jnp.zeros((2, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), image=img, text=txt)
    out = model.apply(params, image=img, text=txt)
    assert out["image_features"].shape == (2, 32)
    assert out["text_features"].shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0, rtol=1e-5)


def test_daclip_control_encode(tiny_daclip):
    model, params = tiny_daclip
    img = jnp.ones((2, 32, 32, 3)) * 0.1
    img_f, degra_f = model.apply(params, img, control=True, normalize=True,
                                 method=model.encode_image)
    assert img_f.shape == (2, 32) and degra_f.shape == (2, 32)


def test_zero_controller_is_identity(tiny_daclip):
    """With zero_modules at zero (their init), the controlled image features equal
    the plain CLIP features (hiddens are all-zero) — daclip_model.py:26-34 invariant
    after initial_controller()."""
    model, params = tiny_daclip
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    img_f, _ = model.apply(params, img, control=True, method=model.encode_image)
    plain = model.apply(params, img, control=False, method=model.encode_image)
    np.testing.assert_allclose(np.asarray(img_f), np.asarray(plain), atol=1e-5)


def test_control_injection_changes_features(tiny_daclip):
    model, params = tiny_daclip
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    # perturb the zero modules -> controlled features must diverge from plain
    # (random, not constant: a channel-constant shift would be nulled by LayerNorm)
    p2 = jax.tree.map(lambda x: x, params)
    zm = p2["params"]["visual_control"]["transformer"]["resblocks"]["zero_module"]
    zm["kernel"] = zm["kernel"] + 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), zm["kernel"].shape)
    img_f, _ = model.apply(p2, img, control=True, method=model.encode_image)
    plain = model.apply(p2, img, control=False, method=model.encode_image)
    assert np.abs(np.asarray(img_f - plain)).max() > 1e-3


def test_predictor_shapes_and_range(tiny_daclip):
    pred = MultiTypeDegradationPredictor()
    f = jax.random.normal(jax.random.PRNGKey(0), (3, 16))
    toks = jax.random.normal(jax.random.PRNGKey(1), (28, 16))
    centers = jnp.broadcast_to(jnp.linspace(0.5, 4.0, 7), (4, 7))
    params = pred.init(jax.random.PRNGKey(2), f, toks, centers)
    out = pred.apply(params, f, toks, centers)
    assert out.shape == (3, 4)
    # expectation over bins of centers/(1±tanh) stays within 0.5·[min/2, 2·max]
    assert np.all(np.asarray(out) > 0)


def test_daclip_forward_full(tiny_daclip):
    model, params = tiny_daclip
    img = jnp.ones((2, 32, 32, 3)) * 0.2
    txt = jnp.concatenate([jnp.ones((2, 16), jnp.int32),
                           2 * jnp.ones((2, 16), jnp.int32)], axis=-1)
    out = model.apply(params, image=img, text=txt, gt_images=img,
                      deg_type=jnp.ones((2, 4)), gt_val=jnp.ones((2, 4)),
                      bin_center_bank=jnp.ones((4, 7)),
                      all_d_type_tokens=jnp.ones((28, 16), jnp.int32))
    for k in ["image_features", "text_features", "image_degra_features",
              "gt_image_features", "text_degra_features"]:
        assert out[k].shape == (2, 32), k
    assert out["pred"].shape == (2, 4)
    assert out["all_d_type_tokens_features"].shape == (28, 32)


def test_unet_shapes_and_padding():
    net = ConditionalUNet(nf=32, ch_mult=(1, 2), context_dim=64,
                          use_degra_context=True, use_image_context=True)
    # 14x18 is not a multiple of 2^depth=4 → exercises reflect-pad + crop
    xt = jnp.ones((1, 14, 18, 3))
    cond = jnp.zeros_like(xt)
    tctx = jnp.ones((1, 64))
    ictx = jnp.ones((1, 64))
    params = net.init(jax.random.PRNGKey(0), xt, cond, jnp.array([3.0]),
                      tctx, ictx)
    out = net.apply(params, xt, cond, jnp.array([3.0]), tctx, ictx)
    assert out.shape == (1, 14, 18, 3)
    # contexts actually matter
    out2 = net.apply(params, xt, cond, jnp.array([3.0]), tctx * 2, ictx)
    assert np.abs(np.asarray(out - out2)).max() > 0


def test_unet_scalar_time_and_no_context():
    net = ConditionalUNet(nf=32, ch_mult=(1, 2), context_dim=None,
                          use_degra_context=False, use_image_context=False)
    xt = jnp.ones((2, 16, 16, 3))
    params = net.init(jax.random.PRNGKey(0), xt, xt * 0.5, 7.0)
    out = net.apply(params, xt, xt * 0.5, 7.0)
    assert out.shape == (2, 16, 16, 3)


def test_resblock_merged_res_conv_matches_separate(monkeypatch):
    """The merged block1+res_conv conv (DACLIP_TPU_MERGE_RES, models/unet.py)
    must be numerically equivalent to the separate conv + 1x1 dot, with an
    identical param tree (it is an apply-time reparameterization only)."""
    from daclip_tpu.models.unet import ResBlock

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 12, 12, 128), jnp.float32)
    t = jax.random.normal(jax.random.fold_in(key, 1), (2, 256), jnp.float32)
    rb = ResBlock(64, dtype=jnp.float32)

    from daclip_tpu import flags
    monkeypatch.setattr(flags, "MERGE_RES", True)
    p1 = rb.init(jax.random.PRNGKey(7), x, t)
    y1 = rb.apply(p1, x, t)
    monkeypatch.setattr(flags, "MERGE_RES", False)
    p0 = rb.init(jax.random.PRNGKey(7), x, t)
    y0 = rb.apply(p0, x, t)

    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               atol=1e-5, rtol=1e-5)
