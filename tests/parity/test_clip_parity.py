"""Golden activation parity: our flax CLIP/DaCLIP vs the torch reference with the
SAME (randomly initialised, converted) weights.  Validates the weight converter and
— critically — the reversed `control.pop()` injection order (transformer.py:359-368).
"""
import numpy as np
import pytest

from tests.conftest import requires_reference

pytestmark = requires_reference

TINY_VISION = dict(image_size=32, patch_size=16, width=64, layers=2, head_width=32)
TINY_TEXT = dict(context_length=16, vocab_size=128, width=32, heads=2, layers=2)
EMBED = 32


@pytest.fixture(scope="module")
def torch_mods():
    import torch
    torch.manual_seed(0)
    # the reference ControlTransformer hardcodes .cuda() (transformer.py:297)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from tests.parity.refload import load_ref_openclip_pkg
    pkg = load_ref_openclip_pkg("uir")
    assert pkg.model is not None, getattr(pkg, "model_error", None)
    return pkg


@pytest.fixture(scope="module")
def pair(torch_mods):
    """(torch DaCLIP with perturbed zero-modules, our params dict)."""
    import torch
    from daclip_tpu.models import CLIPCfg, DaCLIP, TextCfg, VisionCfg
    from daclip_tpu.utils.torch_convert import convert_daclip

    torch.manual_seed(1)
    tclip = torch_mods.model.CLIP(embed_dim=EMBED, vision_cfg=dict(TINY_VISION),
                                  text_cfg=dict(TINY_TEXT))
    tda = torch_mods.daclip_model.DaCLIP(tclip)
    tda.initial_controller()
    # make the controller DO something: randomise the zero linears
    with torch.no_grad():
        for m in tda.visual_control.transformer.zero_modules:
            m.weight.normal_(std=0.05)
            m.bias.normal_(std=0.02)
    tda.eval()

    sd = {k: v.detach().numpy() for k, v in tda.state_dict().items()}
    params = {"params": convert_daclip(sd)}
    cfg = CLIPCfg(embed_dim=EMBED,
                  vision=VisionCfg(**TINY_VISION),
                  text=TextCfg(**TINY_TEXT))
    model = DaCLIP(cfg)
    return tda, model, params


def _np(x):
    return x.detach().numpy()


def test_encode_text_parity(pair):
    import torch
    import jax.numpy as jnp
    tda, model, params = pair
    rng = np.random.RandomState(0)
    text = rng.randint(1, 127, size=(3, 16))
    with torch.no_grad():
        want = _np(tda.encode_text(torch.from_numpy(text)))
    got = np.asarray(model.apply(params, jnp.asarray(text), method=model.encode_text))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_encode_image_plain_parity(pair):
    import torch
    import jax.numpy as jnp
    tda, model, params = pair
    rng = np.random.RandomState(1)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = _np(tda.encode_image(torch.from_numpy(img), control=False))
    got = np.asarray(model.apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)),
                                 method=model.encode_image))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_encode_image_control_parity(pair):
    """The DA-CLIP path: controller hiddens injected in reversed block order."""
    import torch
    import jax.numpy as jnp
    tda, model, params = pair
    rng = np.random.RandomState(2)
    img = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want_img, want_deg = tda.encode_image(torch.from_numpy(img), control=True)
    got_img, got_deg = model.apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)),
                                   control=True, method=model.encode_image)
    np.testing.assert_allclose(np.asarray(got_deg), _np(want_deg),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_img), _np(want_img),
                               atol=3e-5, rtol=1e-4)


def test_control_order_actually_matters(pair):
    """Sanity check that the parity above is a real test: flipping the injection
    order the other way must give a DIFFERENT result."""
    import jax.numpy as jnp
    import jax
    tda, model, params = pair
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(2, 3, 32, 32).astype(np.float32).transpose(0, 2, 3, 1))
    got_img, _ = model.apply(params, img, control=True, method=model.encode_image)

    # reverse the stacked zero-module params -> equivalent to un-flipped injection
    p2 = jax.tree.map(lambda x: x, params)
    rb = p2["params"]["visual_control"]["transformer"]["resblocks"]
    # flip all block params so controller runs in reverse order (different result)
    rb["zero_module"] = jax.tree.map(lambda x: jnp.flip(x, 0), rb["zero_module"])
    got2, _ = model.apply(p2, img, control=True, method=model.encode_image)
    assert np.abs(np.asarray(got_img - got2)).max() > 1e-4


def test_predictor_parity():
    import torch
    import jax.numpy as jnp
    from tests.parity.refload import load_ref_openclip_pkg
    from daclip_tpu.models.clip import MultiTypeDegradationPredictor
    from daclip_tpu.utils.torch_convert import convert_predictor

    torch.manual_seed(3)
    torch.nn.Module.cuda = lambda self, *a, **k: self
    pkg = load_ref_openclip_pkg("daclip")
    assert pkg.model is not None, getattr(pkg, "model_error", None)
    tpred = pkg.daclip_model.MultiTypeDegradationPredictor(num_bins=7)
    tpred.eval()

    rng = np.random.RandomState(4)
    B, D = 5, 16
    feats = rng.randn(B, D).astype(np.float32)
    toks = rng.randn(B, 28, D).astype(np.float32)
    centers = np.broadcast_to(np.linspace(0.5, 4.0, 7, dtype=np.float32),
                              (B, 4, 7)).copy()
    with torch.no_grad():
        want = tpred(torch.from_numpy(feats), torch.from_numpy(toks),
                     torch.from_numpy(centers)).numpy()

    sd = {f"predictor.{k}": v.detach().numpy() for k, v in tpred.state_dict().items()}
    params = {"params": convert_predictor(sd)}
    ours = MultiTypeDegradationPredictor()
    got = np.asarray(ours.apply(params, jnp.asarray(feats), jnp.asarray(toks),
                                jnp.asarray(centers)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_scaled_cosine_attention_parity():
    """ScaledCosineAttention vs the reference's custom Attention
    (open_clip/transformer.py:87-160), both scaled-cosine and vanilla modes."""
    import torch
    import jax.numpy as jnp
    from tests.parity.refload import load_ref_openclip_pkg
    from daclip_tpu.models.layers import ScaledCosineAttention

    torch.manual_seed(5)
    pkg = load_ref_openclip_pkg("uir")
    assert pkg.transformer is not None
    D, H, L, B = 32, 4, 7, 3
    rng = np.random.RandomState(6)
    x = rng.randn(B, L, D).astype(np.float32)

    for scaled_cosine in (True, False):
        tattn = pkg.transformer.Attention(D, num_heads=H,
                                          scaled_cosine=scaled_cosine)
        tattn.eval()
        with torch.no_grad():
            # reference layout is (L, N, C)
            want = tattn(torch.from_numpy(x.transpose(1, 0, 2))
                         ).numpy().transpose(1, 0, 2)

        params = {
            "in_proj": {
                "kernel": tattn.in_proj_weight.detach().numpy().T,
                "bias": tattn.in_proj_bias.detach().numpy(),
            },
            "out_proj": {
                "kernel": tattn.out_proj.weight.detach().numpy().T,
                "bias": tattn.out_proj.bias.detach().numpy(),
            },
        }
        if scaled_cosine:
            params["logit_scale"] = tattn.logit_scale.detach().numpy()
        ours = ScaledCosineAttention(D, H, scaled_cosine=scaled_cosine)
        got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
