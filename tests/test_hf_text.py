"""HF text tower tests with locally-constructed tiny Flax models (no
downloads) — hf_model.py:43-193 + hf_configs.py:5-45 surface."""
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


def _bert_cfg():
    from transformers import BertConfig
    return BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=2, intermediate_size=64,
                      max_position_embeddings=64)


@pytest.fixture(scope="module")
def tiny_bert():
    from transformers import FlaxBertModel
    return FlaxBertModel(_bert_cfg(), seed=0)


def test_hf_text_tower_poolers(tiny_bert):
    import jax
    import jax.numpy as jnp
    from daclip_tpu.models.hf_text import POOLERS, HFTextTower

    ids = jnp.asarray([[5, 6, 7, 0, 0], [8, 9, 10, 11, 12]], jnp.int32)
    for pooler in POOLERS:
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


def test_cls_pooler_uses_pooling_head(tiny_bert):
    """cls_pooler returns the tanh pooling head's output when present
    (ClsPooler.use_pooler_output, hf_model.py:66-81);
    cls_last_hidden_state_pooler returns the raw first token — they must
    differ on a model that HAS a pooling head."""
    import jax
    import jax.numpy as jnp
    from daclip_tpu.models.hf_text import HFTextTower

    ids = jnp.asarray([[5, 6, 7, 0, 0]], jnp.int32)
    t_cls = HFTextTower(tiny_bert, output_dim=16, pooler_type="cls_pooler",
                        proj="linear")
    t_raw = HFTextTower(tiny_bert, output_dim=16,
                        pooler_type="cls_last_hidden_state_pooler",
                        proj="linear")
    p = t_cls.init_params(jax.random.PRNGKey(0))
    a = np.asarray(t_cls.encode(p, ids))
    b = np.asarray(t_raw.encode(p, ids))
    assert not np.allclose(a, b)


def test_output_tokens_cls_drop(tiny_bert):
    """output_tokens: cls_pooler drops the CLS position from the token
    sequence, cls_last_hidden_state_pooler keeps it (hf_model.py:157-168)."""
    import jax
    import jax.numpy as jnp
    from daclip_tpu.models.hf_text import HFTextTower

    ids = jnp.asarray([[5, 6, 7, 0, 0]], jnp.int32)
    t = HFTextTower(tiny_bert, output_dim=16, pooler_type="cls_pooler")
    p = t.init_params(jax.random.PRNGKey(0))
    feats, toks = t.encode(p, ids, output_tokens=True)
    assert feats.shape == (1, 16) and toks.shape == (1, 4, 32)
    t2 = HFTextTower(tiny_bert, output_dim=16,
                     pooler_type="cls_last_hidden_state_pooler")
    _, toks2 = t2.encode(p, ids, output_tokens=True)
    assert toks2.shape == (1, 5, 32)


def test_from_config_bert_defaults():
    """from_config builds the Flax model and picks the arch-default pooler
    (bert → cls_pooler per ARCH_DICT / hf_configs.py:45-56)."""
    import jax
    import jax.numpy as jnp
    from daclip_tpu.models.hf_text import HFTextTower

    tower = HFTextTower.from_config(_bert_cfg(), output_dim=16)
    assert tower.pooler_type == "cls_pooler"
    assert tower.vocab_size == 100 and tower.context_length == 64
    p = tower.init_params(jax.random.PRNGKey(0))
    out = tower.encode(p, jnp.asarray([[5, 6, 7, 0]], jnp.int32))
    assert out.shape == (1, 16)
    # identity projection when dims already match (hf_model.py:142-143)
    ident = HFTextTower.from_config(_bert_cfg(), output_dim=32, proj=None)
    p2 = ident.init_params(jax.random.PRNGKey(0))
    out2 = ident.encode(p2, jnp.asarray([[5, 6, 7, 0]], jnp.int32))
    assert out2.shape == (1, 32)
    with pytest.raises(ValueError):
        HFTextTower.from_config(_bert_cfg(), output_dim=16, proj=None)


def test_from_config_t5_encoder_only():
    """Encoder-decoder models contribute only their encoder
    (hf_model.py:124-126); mean pooling is the arch default."""
    import jax
    import jax.numpy as jnp
    from transformers import T5Config

    from daclip_tpu.models.hf_text import HFTextTower

    cfg = T5Config(vocab_size=64, d_model=32, d_kv=16, d_ff=64, num_layers=2,
                   num_heads=2)
    tower = HFTextTower.from_config(cfg, output_dim=16)
    assert tower.pooler_type == "mean_pooler" and tower._encoder_decoder
    p = tower.init_params(jax.random.PRNGKey(0))
    out = tower.encode(p, jnp.asarray([[5, 6, 7, 0]], jnp.int32),
                       normalize=True)
    assert out.shape == (1, 16)


def test_lock_mask(tiny_bert):
    """lock semantics (hf_model.py:170-186): 0 layers → whole tower frozen
    except (optionally) LayerNorms; 1 layer → last encoder layer trainable,
    embeddings + layer 0 frozen; projection always trainable."""
    import jax
    from flax.traverse_util import flatten_dict

    from daclip_tpu.models.hf_text import HFTextTower

    tower = HFTextTower(tiny_bert, output_dim=16, pooler_type="mean_pooler")
    params = tower.init_params(jax.random.PRNGKey(0))

    full = tower.lock_mask(params, unlocked_layers=0, freeze_layer_norm=True)
    flat = flatten_dict(full["hf"])
    assert not any(flat.values())  # everything in the tower frozen
    assert all(jax.tree.leaves(full["proj"]))

    ln_free = tower.lock_mask(params, unlocked_layers=0,
                              freeze_layer_norm=False)
    flat_ln = flatten_dict(ln_free["hf"])
    trainables = [k for k, v in flat_ln.items() if v]
    assert trainables and all(
        any("layernorm" in str(p).lower().replace("_", "") for p in k)
        for k in trainables)

    part = tower.lock_mask(params, unlocked_layers=1, freeze_layer_norm=True)
    flat_p = flatten_dict(part["hf"])
    for k, v in flat_p.items():
        path = [str(p) for p in k]
        if "layer" in path:
            idx = int(path[path.index("layer") + 1])
            assert v == (idx >= 1), k
        elif path[0] == "embeddings":
            assert not v, k
