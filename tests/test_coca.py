"""CoCa model (coca_model.py:82-296 parity surface): forward shapes, factory
construction, scan-sampler generation, loss integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daclip_tpu.factory import create_model
from daclip_tpu.models.coca import generate


@pytest.fixture(scope="module")
def coca():
    model, params = create_model("coca_test-tiny")
    return model, {"params": params}


def test_coca_forward_shapes(coca):
    model, variables = coca
    B, L = 2, 16  # tokenizer emits context_length+1 = 16 tokens
    img = jnp.ones((B, 32, 32, 3))
    txt = jnp.ones((B, L), jnp.int32)
    out = model.apply(variables, img, txt)
    assert out["image_features"].shape == (B, 32)
    assert out["text_features"].shape == (B, 32)
    # token_embs exclude the appended CLS -> L-1 positions
    assert out["logits"].shape == (B, L - 1, 49408)
    assert out["labels"].shape == (B, L - 1)
    np.testing.assert_array_equal(np.asarray(out["labels"]),
                                  np.asarray(txt[:, 1:]))
    # contrastive latents are unit-norm (encode_* normalize=True default)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        atol=1e-5)


def test_coca_encode_methods(coca):
    model, variables = coca
    img = jnp.ones((2, 32, 32, 3))
    lat = model.apply(variables, img, method=model.encode_image)
    assert lat.shape == (2, 32)
    txt = jnp.ones((2, 16), jnp.int32)
    tlat = model.apply(variables, txt, method=model.encode_text)
    assert tlat.shape == (2, 32)


def test_coca_attentional_pool_token_count(coca):
    model, variables = coca
    img = jnp.ones((2, 32, 32, 3))
    lat, tokens = model.apply(variables, img, method=model._encode_image)
    # n_queries=9 pooled tokens, first consumed as the latent -> 8 remain
    assert tokens.shape == (2, 8, 32)


def test_coca_generate_greedy_deterministic(coca):
    model, variables = coca
    img = jnp.linspace(0, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    key = jax.random.PRNGKey(0)
    a = generate(model, variables, img, key, seq_len=10, top_k=1)
    b = generate(model, variables, img, key, seq_len=10, top_k=1)
    assert a.shape == (2, 10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    a = np.asarray(a)
    assert (a[:, 0] == 49406).all()       # SOT first
    # EOS appears exactly once per row, then only PAD after it
    for row in a:
        eos = np.where(row == 49407)[0]
        assert len(eos) >= 1
        assert (row[eos[0] + 1:] == 0).all()


def test_coca_generate_min_seq_len(coca):
    model, variables = coca
    img = jnp.zeros((1, 32, 32, 3))
    out = np.asarray(generate(model, variables, img, jax.random.PRNGKey(1),
                              seq_len=12, min_seq_len=6, top_k=1))
    eos = np.where(out[0] == 49407)[0]
    assert len(eos) >= 1 and eos[0] >= 6


def test_coca_generate_top_p_and_penalty(coca):
    model, variables = coca
    img = jnp.zeros((1, 32, 32, 3))
    out = generate(model, variables, img, jax.random.PRNGKey(2), seq_len=8,
                   generation_type="top_p", top_p=0.5, repetition_penalty=1.2)
    assert out.shape == (1, 8)
    with pytest.raises(ValueError):
        generate(model, variables, img, jax.random.PRNGKey(2),
                 generation_type="beam_search")


def test_coca_loss_integration(coca):
    import importlib
    L = importlib.import_module("daclip_tpu.losses.clip_loss")
    model, variables = coca
    B = 4
    img = jax.random.uniform(jax.random.PRNGKey(3), (B, 32, 32, 3))
    txt = jax.random.randint(jax.random.PRNGKey(4), (B, 16), 1, 1000)
    out = model.apply(variables, img, txt)
    losses = L.coca_loss(out["image_features"], out["text_features"],
                         out["logits"], out["labels"], out["logit_scale"])
    assert np.isfinite(float(losses["contrastive_loss"]))
    assert np.isfinite(float(losses["caption_loss"]))
    # gradient flows through both towers and the decoder
    def f(p):
        o = model.apply({"params": p}, img, txt)
        d = L.coca_loss(o["image_features"], o["text_features"], o["logits"],
                        o["labels"], o["logit_scale"])
        return d["contrastive_loss"] + d["caption_loss"]
    g = jax.grad(f)(variables["params"])
    gd = jax.tree.map(lambda x: float(jnp.abs(x).sum()), g)
    flat = jax.tree.leaves(gd)
    assert all(np.isfinite(v) for v in flat) and sum(flat) > 0


def test_coca_generate_greedy_is_argmax(coca):
    """generation_type='greedy' must be deterministic argmax decoding —
    independent of the PRNG key."""
    model, variables = coca
    img = jnp.linspace(0, 1, 32 * 32 * 3).reshape(1, 32, 32, 3)
    a = generate(model, variables, img, jax.random.PRNGKey(0), seq_len=8,
                 generation_type="greedy")
    b = generate(model, variables, img, jax.random.PRNGKey(123), seq_len=8,
                 generation_type="greedy")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
