"""CoCa — contrastive captioner (open_clip/coca_model.py:82-458).

TPU-native shape: the model is a flax module returning the training dict
(contrastive latents + caption logits); `generate()` is a jit-compilable
fixed-length `lax.scan` sampler (top-k / top-p / greedy) — the reference's
dynamic Python `while` loop with HuggingFace logits processors
(coca_model.py:179-296) maps onto static-shape scan steps where each step
re-runs the causal decoder on the full fixed-width token buffer (the causal
mask makes trailing pad positions invisible, so per-step logits are identical
to the incremental-decode result).  Output is always (B, seq_len), i.e. the
reference's `fixed_output_length=True` convention — the natural form for a
static-shape accelerator.

Beam search (coca_model.py:296-458) is intentionally not ported: it exists in
the reference only for qualitative caption demos, depends on HF's beam scorer,
and is off the DA-CLIP/IR path.  top_k=1 gives deterministic greedy decoding.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from daclip_tpu.models.clip import CLIPCfg, TextCfg, VisionCfg
from daclip_tpu.models.transformer import (MultimodalTransformer,
                                           TextTransformer, VisionTransformer)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class MultimodalCfg:
    """coca_model.py:44-50 (MultimodalCfg extends CLIPTextCfg)."""
    context_length: int = 76
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    dim_head: int = 64
    n_queries: int = 256
    attn_pooler_heads: int = 8


@dataclasses.dataclass(frozen=True)
class CoCaCfg:
    embed_dim: int = 512
    vision: VisionCfg = dataclasses.field(default_factory=VisionCfg)
    text: TextCfg = dataclasses.field(default_factory=TextCfg)
    multimodal: MultimodalCfg = dataclasses.field(default_factory=MultimodalCfg)
    quick_gelu: bool = False
    pad_id: int = 0

    @staticmethod
    def from_dict(d) -> "CoCaCfg":
        base = CLIPCfg.from_dict(d)
        m = {k: v for k, v in d.get("multimodal_cfg", {}).items()
             if k in {f.name for f in dataclasses.fields(MultimodalCfg)}}
        return CoCaCfg(embed_dim=base.embed_dim, vision=base.vision,
                       text=base.text, multimodal=MultimodalCfg(**m),
                       quick_gelu=base.quick_gelu,
                       pad_id=base.text.pad_id)  # text_cfg.pad_id is canonical


class CoCa(nn.Module):
    """coca_model.py:82-177: contrastive towers + caption decoder."""
    cfg: CoCaCfg
    remat: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        import math

        c = self.cfg
        v, t, m = c.vision, c.text, c.multimodal
        self.visual = VisionTransformer(
            image_size=v.image_size, patch_size=v.patch_size, width=v.width,
            layers=v.layers, heads=v.heads, mlp_ratio=v.mlp_ratio,
            output_dim=c.embed_dim, quick_gelu=c.quick_gelu,
            global_average_pool=v.global_average_pool,
            attentional_pool=v.attentional_pool, n_queries=v.n_queries,
            attn_pooler_heads=v.attn_pooler_heads, output_tokens=True,
            remat=self.remat, dtype=self.dtype)
        self.text = TextTransformer(
            context_length=t.context_length, vocab_size=t.vocab_size,
            width=t.width, heads=t.heads, layers=t.layers, mlp_ratio=t.mlp_ratio,
            output_dim=c.embed_dim, quick_gelu=c.quick_gelu,
            embed_cls=True, pad_id=c.pad_id, output_tokens=True,
            remat=self.remat, dtype=self.dtype)
        # decoder projects to the vocab (the reference passes vocab_size as the
        # decoder tower's embed_dim, coca_model.py:115-120)
        self.text_decoder = MultimodalTransformer(
            width=m.width, layers=m.layers, heads=m.heads,
            context_length=m.context_length, mlp_ratio=m.mlp_ratio,
            output_dim=t.vocab_size, quick_gelu=c.quick_gelu,
            remat=self.remat, dtype=self.dtype)
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(math.log(1 / 0.07), jnp.float32))

    @staticmethod
    def _norm(x, normalize: bool = True):
        if not normalize:
            return x
        return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1,
                                   keepdims=True).astype(x.dtype)

    def _encode_image(self, images, normalize: bool = True):
        image_latent, tokens = self.visual(images)
        return self._norm(image_latent, normalize), tokens

    def _encode_text(self, text, normalize: bool = True, embed_cls: bool = True):
        text = text[:, :-1] if embed_cls else text  # make space for CLS
        text_latent, token_emb = self.text(text, embed_cls=embed_cls)
        return self._norm(text_latent, normalize), token_emb

    def encode_image(self, images, normalize: bool = True):
        return self._encode_image(images, normalize)[0]

    def encode_text(self, text, normalize: bool = True, embed_cls: bool = True):
        return self._encode_text(text, normalize, embed_cls)[0]

    def __call__(self, image, text, embed_cls: bool = True,
                 image_latent=None, image_embs=None):
        text_latent, token_embs = self._encode_text(text, embed_cls=embed_cls)
        if image_latent is None or image_embs is None:
            image_latent, image_embs = self._encode_image(image)
        labels = text[:, -token_embs.shape[1]:]
        logits = self.text_decoder(image_embs, token_embs)
        return {
            "image_features": image_latent,
            "text_features": text_latent,
            "logits": logits,
            "labels": labels,
            "logit_scale": jnp.exp(self.logit_scale),
        }


def generate(
    model: CoCa,
    variables,
    image,
    key,
    seq_len: int = 30,
    temperature: float = 1.0,
    generation_type: str = "top_k",
    top_p: float = 0.1,
    top_k: int = 1,
    min_seq_len: int = 5,
    repetition_penalty: float = 1.0,
    sot_token_id: int = 49406,
    eos_token_id: int = 49407,
    pad_token_id: Optional[int] = None,
):
    """Fixed-length caption sampling (coca_model.py:179-296 semantics; see
    module docstring for the TPU-native design).  Returns (B, seq_len) int32
    token ids: SOT, generated tokens, EOS, then PAD."""
    if generation_type not in ("top_k", "top_p", "greedy"):
        raise ValueError(f"generation_type {generation_type!r} not in "
                         "{'top_k', 'top_p', 'greedy'}")
    assert seq_len > min_seq_len, "seq_len must be larger than min_seq_len"
    pad_id = model.cfg.pad_id if pad_token_id is None else pad_token_id
    vocab = model.cfg.text.vocab_size
    B = image.shape[0]

    image_latent, image_embs = model.apply(
        variables, image, method=model._encode_image)

    tokens0 = jnp.full((B, seq_len), pad_id, jnp.int32).at[:, 0].set(sot_token_id)
    use_penalty = repetition_penalty != 1.0
    # the (B, vocab) seen-token mask is only needed by the repetition penalty
    seen0 = (jax.nn.one_hot(tokens0[:, 0], vocab, dtype=jnp.float32)
             if use_penalty else jnp.zeros((B, 1), jnp.float32))

    def logits_fn(tokens):
        out = model.apply(variables, image, tokens, embed_cls=False,
                          image_latent=image_latent, image_embs=image_embs)
        return out["logits"].astype(jnp.float32)

    def warp(logits):
        if generation_type == "greedy":
            return logits
        if generation_type == "top_k":
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            return jnp.where(logits < kth, -jnp.inf, logits)
        # top_p nucleus: keep the smallest set of top tokens whose cumulative
        # probability reaches top_p (HF TopPLogitsWarper semantics)
        srt = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1) - probs  # exclusive cumsum
        keep_sorted = cum < top_p
        cutoff = jnp.sum(keep_sorted, axis=-1) - 1  # index of last kept (sorted)
        threshold = jnp.take_along_axis(srt, cutoff[:, None], axis=-1)
        return jnp.where(logits < threshold, -jnp.inf, logits)

    def step(carry, i):
        tokens, seen, done = carry
        logits = logits_fn(tokens)[jnp.arange(B), i - 1]
        # MinLengthLogitsProcessor (coca_model.py:196-200)
        logits = logits.at[:, eos_token_id].set(
            jnp.where(i < min_seq_len, -jnp.inf, logits[:, eos_token_id]))
        if use_penalty:
            # RepetitionPenaltyLogitsProcessor over already-emitted tokens
            pen = jnp.where(logits > 0, logits / repetition_penalty,
                            logits * repetition_penalty)
            logits = jnp.where(seen > 0, pen, logits)
        logits = warp(logits)
        if generation_type == "greedy":
            sample = jnp.argmax(logits, axis=-1)
        else:
            k = jax.random.fold_in(key, i)
            sample = jax.random.categorical(k, logits / temperature, axis=-1)
        # force EOS on the final position (coca_model.py:272-275)
        sample = jnp.where(i == seq_len - 1,
                           jnp.asarray(eos_token_id, sample.dtype), sample)
        prev = tokens[:, i - 1]
        done = done | (prev == eos_token_id) | ((prev == pad_id) & (i > 1))
        sample = jnp.where(done, jnp.asarray(pad_id, sample.dtype), sample)
        tokens = tokens.at[:, i].set(sample.astype(jnp.int32))
        if use_penalty:
            seen = jnp.maximum(seen, jax.nn.one_hot(sample, vocab,
                                                    dtype=jnp.float32))
        return (tokens, seen, done), None

    (tokens, _, _), _ = jax.lax.scan(
        step, (tokens0, seen0, jnp.zeros((B,), bool)),
        jnp.arange(1, seq_len))
    return tokens
