"""HF text tower tests with a locally-constructed tiny Flax BERT (no downloads)."""
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_bert():
    from transformers import BertConfig, FlaxBertModel
    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=64)
    return FlaxBertModel(cfg, seed=0)


def test_hf_text_tower_poolers(tiny_bert):
    import jax
    import jax.numpy as jnp
    from daclip_tpu.models.hf_text import HFTextTower

    ids = jnp.asarray([[5, 6, 7, 0, 0], [8, 9, 10, 11, 12]], jnp.int32)
    for pooler in ["mean_pooler", "cls_pooler", "max_pooler"]:
        tower = HFTextTower(tiny_bert, output_dim=16, pooler_type=pooler)
        params = tower.init_params(jax.random.PRNGKey(0))
        feats = tower.encode(params, ids, normalize=True)
        assert feats.shape == (2, 16)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(feats), axis=-1), 1.0, rtol=1e-5)


def test_mean_pool_ignores_padding(tiny_bert):
    import jax
    import jax.numpy as jnp
    from daclip_tpu.models.hf_text import HFTextTower

    tower = HFTextTower(tiny_bert, output_dim=16, pooler_type="mean_pooler")
    params = tower.init_params(jax.random.PRNGKey(0))
    a = tower.encode(params, jnp.asarray([[5, 6, 7, 0, 0]], jnp.int32))
    b = tower.encode(params, jnp.asarray([[5, 6, 7, 0, 0, 0, 0]], jnp.int32))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
