"""Golden activation parity: our flax CoCa vs the torch reference
(coca_model.py:82-177) with the SAME randomly-initialised, converted weights.
Exercises the AttentionalPooler (unpacked q/k/v MHA: kdim != d_model), the
embed_cls text tower with its cls mask quirks, and the MultimodalTransformer
self+cross decoder."""
import numpy as np
import pytest

from tests.conftest import requires_reference

pytestmark = requires_reference

EMBED = 32
VISION = dict(image_size=32, patch_size=16, width=64, layers=2, head_width=32,
              attentional_pool=True, n_queries=9, attn_pooler_heads=4,
              output_tokens=True)
TEXT = dict(context_length=15, vocab_size=128, width=32, heads=2, layers=2,
            embed_cls=True, output_tokens=True)
MULTI = dict(context_length=15, vocab_size=128, width=32, heads=2, layers=2)


@pytest.fixture(scope="module")
def pair():
    import torch

    from daclip_tpu.models.coca import CoCa, CoCaCfg
    from daclip_tpu.utils.torch_convert import convert_coca
    from tests.parity.refload import load_ref_openclip_pkg

    pkg = load_ref_openclip_pkg("uir")
    assert pkg.coca_model is not None, getattr(pkg, "coca_error", None)
    torch.manual_seed(0)
    tcoca = pkg.coca_model.CoCa(embed_dim=EMBED, multimodal_cfg=dict(MULTI),
                                text_cfg=dict(TEXT), vision_cfg=dict(VISION))
    tcoca.eval()
    sd = {k: v.detach().numpy() for k, v in tcoca.state_dict().items()}
    params = {"params": convert_coca(sd)}
    cfg = CoCaCfg.from_dict({"embed_dim": EMBED, "vision_cfg": VISION,
                             "text_cfg": TEXT, "multimodal_cfg": MULTI})
    return tcoca, CoCa(cfg), params


def test_coca_forward_parity(pair):
    import torch

    tcoca, jcoca, params = pair
    rng = np.random.RandomState(0)
    img = rng.rand(2, 32, 32, 3).astype(np.float32)
    txt = rng.randint(1, 128, size=(2, 16)).astype(np.int64)
    txt[:, 0] = 1
    txt[:, -1] = 127  # EOT-ish
    txt[0, 10:] = 0   # padding to exercise the cls mask

    with torch.no_grad():
        tout = tcoca(torch.from_numpy(img).permute(0, 3, 1, 2),
                     torch.from_numpy(txt))
    jout = jcoca.apply(params, img, txt.astype(np.int32))

    np.testing.assert_allclose(np.asarray(jout["image_features"]),
                               tout["image_features"].numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jout["text_features"]),
                               tout["text_features"].numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jout["labels"]),
                               tout["labels"].numpy())
    np.testing.assert_allclose(np.asarray(jout["logits"]),
                               tout["logits"].numpy(), atol=2e-3, rtol=1e-2)


def test_coca_encode_image_parity(pair):
    import torch

    tcoca, jcoca, params = pair
    rng = np.random.RandomState(1)
    img = rng.rand(3, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        tlat = tcoca.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
    jlat = jcoca.apply(params, img, method=jcoca.encode_image)
    np.testing.assert_allclose(np.asarray(jlat), tlat.numpy(),
                               atol=2e-4, rtol=1e-3)
