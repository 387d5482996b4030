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


def test_coca_beam_search_parity(pair):
    """generate_beam vs the reference _generate_beamsearch with its vintage
    BeamSearchScorer resurrected (beam_oracle.py).

    Both sides decode from ONE shared deterministic logit table
    (logits for a prefix = table[last_token, position]) injected as the
    decoder — beam decisions through a real f32 model are tie-fragile
    (~5e-3 cross-framework logit noise vs ~1e-3 candidate gaps), while the
    table makes every topk/argmax decision unambiguous and bit-identical, so
    token sequences must match EXACTLY.  Covers grouped (6/3), even (4/2)
    and degenerate (2/1) beam configs, plus an eos-rich table that exercises
    the hypothesis pool, the done-batch pad path and finalize."""
    import types

    import torch

    from daclip_tpu.models.coca import generate_beam
    from tests.parity.beam_oracle import arm_reference_beamsearch

    tcoca, jcoca, params = pair
    arm_reference_beamsearch(__import__("sys").modules[
        type(tcoca).__module__])
    V, B = 128, 3
    EOS, SOT, PAD = 2, 1, 0

    for cfg_i, (beams, groups, seq_len, eos_boost) in enumerate(
            [(6, 3, 12, 1.0), (4, 2, 16, 2.0), (2, 1, 10, 1.5)]):
        rng = np.random.RandomState(100 + cfg_i)
        table = rng.rand(V, seq_len, V).astype(np.float32)
        table[:, :, EOS] += (rng.rand(V, seq_len) > 0.6) * eos_boost
        ttab = torch.from_numpy(table)

        def fake_forward(self, images, text, embed_cls=False,
                         image_latent=None, image_embs=None):
            last = text[:, -1].long()
            pos = text.shape[1] - 1
            logits = torch.zeros(text.shape[0], text.shape[1], V)
            logits[:, -1] = ttab[last, pos]
            return {"logits": logits}

        old_forward = tcoca.forward
        tcoca.forward = types.MethodType(fake_forward, tcoca)
        try:
            img = torch.zeros(B, 3, 32, 32)
            with torch.no_grad():
                ref = tcoca.generate(
                    img, generation_type="beam_search", seq_len=seq_len,
                    min_seq_len=3, num_beams=beams, num_beam_groups=groups,
                    sot_token_id=SOT, eos_token_id=EOS, pad_token_id=PAD,
                    fixed_output_length=True).numpy()
        finally:
            tcoca.forward = old_forward

        jtab = np.asarray(table)

        def jlogits(tokens):  # (B, N, L) -> (B, N, L, V)
            import jax.numpy as jnp
            t = jnp.asarray(jtab)
            pos = jnp.arange(tokens.shape[-1])
            return t[tokens, pos[None, None, :]]

        out = np.asarray(generate_beam(
            jcoca, params, np.zeros((B, 32, 32, 3), np.float32),
            seq_len=seq_len, min_seq_len=3, num_beams=beams,
            num_beam_groups=groups, sot_token_id=SOT, eos_token_id=EOS,
            pad_token_id=PAD, logits_fn=jlogits))
        np.testing.assert_array_equal(
            out, ref, err_msg=f"config {beams}/{groups}/L{seq_len}")


def test_coca_beam_search_real_model_smoke(pair):
    """Structural sanity through the real tiny model: shapes, SOT prefix,
    single EOS then PAD (token-exact parity is covered by the shared-table
    test above)."""
    import torch

    from daclip_tpu.models.coca import generate_beam
    from daclip_tpu.utils.torch_convert import convert_coca

    import copy

    tcoca, jcoca, _ = pair
    tcoca = copy.deepcopy(tcoca)  # don't mutate the shared fixture model
    # the reference leaves text_decoder.text_projection as torch.empty
    # (open_clip init_parameters skips it); garbage ~1e8 weights push the
    # RAW-logit beam scores to inf — give it a sane init for this test
    with torch.no_grad():
        torch.manual_seed(3)
        tcoca.text_decoder.text_projection.normal_(std=0.02)
    sd = {k: v.detach().numpy() for k, v in tcoca.state_dict().items()}
    params = {"params": convert_coca(sd)}
    rng = np.random.RandomState(7)
    img = rng.rand(2, 32, 32, 3).astype(np.float32)
    out = np.asarray(generate_beam(jcoca, params, img, seq_len=12,
                                   min_seq_len=3, sot_token_id=1,
                                   eos_token_id=2, pad_token_id=0))
    assert out.shape == (2, 12) and (out[:, 0] == 1).all()
    for row in out:
        eos_pos = np.where(row == 2)[0]
        if eos_pos.size:
            assert (row[eos_pos[0] + 1:] == 0).all()
            assert eos_pos[0] >= 3
