"""Golden parity of the HF text tower vs the reference HFTextEncoder
(da-clip/src/open_clip/hf_model.py:46-168) on a tiny local BERT with shared
weights.  max_pooler is excluded: hf_model.py:59 masked_fill's the VALID
positions (maxes over padding) — a documented upstream bug we fixed."""
import sys

import numpy as np
import pytest

from .refload import REFERENCE, load_ref_openclip_pkg

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

pytestmark = pytest.mark.skipif(not REFERENCE.exists(),
                                reason="reference checkout not present")


def _shared_models(tmp_path):
    """One tiny torch BERT, exported and re-imported as Flax (from_pt) so both
    frameworks hold bit-identical encoder weights."""
    from transformers import BertConfig, BertModel, FlaxBertModel
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=32)
    torch.manual_seed(0)
    pt = BertModel(cfg)  # with pooling head (AutoModel.from_config default)
    d = tmp_path / "bert"
    pt.save_pretrained(d, safe_serialization=False)
    fx = FlaxBertModel.from_pretrained(str(d), from_pt=True)
    return cfg, pt, fx


@pytest.mark.parametrize("pooler", ["mean_pooler", "cls_pooler",
                                    "cls_last_hidden_state_pooler"])
@pytest.mark.parametrize("proj", ["linear", "mlp"])
def test_hf_text_encoder_parity(tmp_path, pooler, proj):
    import jax

    from daclip_tpu.models.hf_text import HFTextTower

    load_ref_openclip_pkg("daclip")
    hf_model = sys.modules["refclip_daclip.hf_model"]

    cfg, pt, fx = _shared_models(tmp_path)
    torch.manual_seed(1)
    ref = hf_model.HFTextEncoder("unused", output_dim=16, config=cfg,
                                 pooler_type=pooler, proj=proj)
    ref.transformer = pt  # share the exact encoder weights
    ref.eval()

    tower = HFTextTower(fx, output_dim=16, pooler_type=pooler, proj=proj)
    params = tower.init_params(jax.random.PRNGKey(0))
    # copy the reference projection weights (torch Linear stores [out, in])
    if proj == "linear":
        params["proj"] = {"params": {"proj": {
            "kernel": ref.proj.weight.detach().numpy().T}}}
    else:
        params["proj"] = {"params": {
            "fc1": {"kernel": ref.proj[0].weight.detach().numpy().T},
            "fc2": {"kernel": ref.proj[2].weight.detach().numpy().T}}}

    ids = np.array([[2, 5, 6, 7, 0, 0], [2, 8, 9, 10, 11, 12]], np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(ids)).numpy()
    got = np.asarray(tower.encode(params, ids.astype(np.int32)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_output_tokens_parity(tmp_path):
    import jax

    from daclip_tpu.models.hf_text import HFTextTower

    load_ref_openclip_pkg("daclip")
    hf_model = sys.modules["refclip_daclip.hf_model"]
    cfg, pt, fx = _shared_models(tmp_path)
    ref = hf_model.HFTextEncoder("unused", output_dim=16, config=cfg,
                                 pooler_type="cls_pooler", proj="linear",
                                 output_tokens=True)
    ref.transformer = pt
    ref.eval()
    tower = HFTextTower(fx, output_dim=16, pooler_type="cls_pooler",
                        proj="linear")
    params = tower.init_params(jax.random.PRNGKey(0))
    params["proj"] = {"params": {"proj": {
        "kernel": ref.proj.weight.detach().numpy().T}}}
    ids = np.array([[2, 5, 6, 7, 0, 0]], np.int64)
    with torch.no_grad():
        want_f, want_t = ref(torch.from_numpy(ids))
    got_f, got_t = tower.encode(params, ids.astype(np.int32),
                                output_tokens=True)
    np.testing.assert_allclose(np.asarray(got_f), want_f.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(), atol=2e-5)
