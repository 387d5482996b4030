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

Beam search (coca_model.py:296-458, `generate_beam` here) is a fixed-length
`lax.scan` port of the reference's HF group beam search.  The reference reads
scorer internals (`len(beam_scorer._beam_hyps)`, coca_model.py:322), pinning
it to the transformers 4.26-4.30 BeamSearchScorer (ONE hypothesis pool of
capacity num_beams per batch, shared by all groups; modern transformers even
removed the top-level export, so the reference's own beam search no longer
runs).  The port reproduces that vintage's semantics exactly — including the
reference's quirks: beam scores accumulate RAW logits (no log_softmax,
coca_model.py:378-380), pool adds divide by the PREFIX length, done batches
append pad with beam score 0 — and is golden-tested against the reference
with the scorer resurrected (tests/parity/beam_oracle.py).
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


def generate_beam(
    model: CoCa,
    variables,
    image,
    seq_len: int = 30,
    num_beams: int = 6,
    num_beam_groups: int = 3,
    min_seq_len: int = 5,
    sot_token_id: int = 49406,
    eos_token_id: int = 49407,
    pad_token_id: Optional[int] = None,
    logits_fn=None,
):
    """Group beam search as one fixed-length `lax.scan`
    (coca_model.py:296-458 semantics; see module docstring for the vintage
    scorer quirks this reproduces).  Deterministic; returns (B, seq_len)
    int32: best hypothesis, its EOS (when it finished or fits), then PAD.

    TPU shape: the decoder runs once per step on all B·num_beams rows of the
    fixed-width token buffer; the scorer's per-candidate python loops become
    unrolled masked updates over the (2·group_size) topk candidates, vmapped
    over the batch.

    `logits_fn` ((B, num_beams, L) int32 -> (B, num_beams, L, V) f32)
    overrides the decoder — used by the parity tests to drive both this and
    the reference scorer with one shared deterministic logit table (beam
    decisions through a real f32 model are tie-fragile)."""
    if num_beams % num_beam_groups:
        raise ValueError("num_beams must be divisible by num_beam_groups")
    assert seq_len > min_seq_len, "seq_len must be larger than min_seq_len"
    pad_id = model.cfg.pad_id if pad_token_id is None else pad_token_id
    V = model.cfg.text.vocab_size
    B = image.shape[0]
    N, G = num_beams, num_beam_groups
    gs = N // G
    L = seq_len
    NEG = jnp.float32(-1e9)

    if logits_fn is None:
        image_latent, image_embs = model.apply(
            variables, image, method=model._encode_image)
        # beams of one batch element share the image (repeat_interleave
        # parity)
        rep = lambda a: jnp.repeat(a, N, axis=0)
        image_r, latent_r = rep(image), rep(image_latent)
        embs_r = rep(image_embs)

        def logits_fn(tokens):                  # (B, N, L) -> (B, N, L, V)
            out = model.apply(variables, image_r, tokens.reshape(B * N, L),
                              embed_cls=False, image_latent=latent_r,
                              image_embs=embs_r)
            return out["logits"].astype(jnp.float32).reshape(B, N, L, V)

    tokens0 = jnp.full((B, N, L), pad_id, jnp.int32).at[:, :, 0].set(
        sot_token_id)
    # beam_scores[:, ::gs] = 0, rest -1e9 (coca_model.py:336-339)
    beam_scores0 = jnp.where(jnp.arange(N) % gs == 0, 0.0, NEG
                             )[None, :].repeat(B, 0).astype(jnp.float32)
    pool_scores0 = jnp.full((B, N), -jnp.inf, jnp.float32)
    pool_tokens0 = jnp.zeros((B, N, L), jnp.int32)
    pool_lens0 = jnp.zeros((B, N), jnp.int32)
    done0 = jnp.zeros((B,), bool)

    def pool_add(pool, score, hyp, length, mask):
        """BeamHypotheses.add: replace the worst slot if score beats it
        (empty slots are -inf, so capacity fills first)."""
        ps, pt, pl = pool
        worst = jnp.argmin(ps)
        take = mask & (score > ps[worst])
        onehot = (jnp.arange(N) == worst) & take
        ps = jnp.where(onehot, score, ps)
        pt = jnp.where(onehot[:, None], hyp[None, :], pt)
        pl = jnp.where(onehot, length, pl)
        return ps, pt, pl

    def group_step(g, i, logits_i, tokens, beam_scores, pool, done):
        """One beam_scorer.process call for group g at step i (vmapped over
        batch inside).  Returns updated group rows + shared pool/done."""
        lo = g * gs

        def per_batch(lg, bs_g, toks_b, ps, pt, pl, dn):
            # lg (gs, V) raw logits of this group's beams; toks_b (N, L)
            sc = lg + bs_g[:, None]                       # (gs, V)
            flat = sc.reshape(gs * V)
            top_sc, top_ix = jax.lax.top_k(flat, 2 * gs)  # sorted desc
            top_tok = top_ix % V
            top_src = top_ix // V                          # local 0..gs-1
            new_sc = jnp.zeros((gs,), jnp.float32)
            new_tok = jnp.full((gs,), pad_id, jnp.int32)
            new_src = jnp.zeros((gs,), jnp.int32)
            count = jnp.int32(0)
            for r in range(2 * gs):
                is_eos = top_tok[r] == eos_token_id
                # eos at rank < gs -> hypothesis (prefix WITHOUT eos,
                # score / prefix_len — the vintage add() divisor)
                add_m = (~dn) & is_eos & (r < gs)
                hyp = toks_b[lo + top_src[r]]
                ps, pt, pl = pool_add((ps, pt, pl), top_sc[r] / i, hyp, i,
                                      add_m)
                # non-eos -> next beam slot (first gs of them)
                assign = (~dn) & (~is_eos) & (count < gs)
                oh = (jnp.arange(gs) == count) & assign
                new_sc = jnp.where(oh, top_sc[r], new_sc)
                new_tok = jnp.where(oh, top_tok[r], new_tok)
                new_src = jnp.where(oh, top_src[r], new_src)
                count = count + assign.astype(jnp.int32)
            # done batches: scores 0, pad appended, reorder to beam 0
            # (the vintage process()'s done-branch)
            # is_done check: pool full & worst >= best_attainable
            pool_full = jnp.all(ps > -jnp.inf)
            dn = dn | (pool_full & (jnp.min(ps) >= top_sc[0] / (i + 1)))
            # gather + append for this group's rows
            src_rows = toks_b[lo + new_src]                # (gs, L)
            src_rows = src_rows.at[:, i].set(new_tok)
            return new_sc, src_rows, ps, pt, pl, dn

        lg = logits_i[:, lo:lo + gs]
        new_sc, new_rows, ps, pt, pl, dn = jax.vmap(per_batch)(
            lg, beam_scores[:, lo:lo + gs], tokens, *pool, done)
        beam_scores = beam_scores.at[:, lo:lo + gs].set(new_sc)
        tokens = tokens.at[:, lo:lo + gs].set(new_rows)
        return tokens, beam_scores, (ps, pt, pl), dn

    def step(carry, i):
        tokens, beam_scores, pool, done = carry
        logits_i = jnp.take_along_axis(
            logits_fn(tokens), (i - 1)[None, None, None, None], axis=2
        )[:, :, 0]                                         # (B, N, V)
        # MinLengthLogitsProcessor: eos blocked while cur_len (=i) < min
        logits_i = jnp.where(
            (i < min_seq_len)
            & (jnp.arange(V) == eos_token_id)[None, None, :],
            -jnp.inf, logits_i)
        for g in range(G):   # groups run sequentially (shared pool + done)
            tokens, beam_scores, pool, done = group_step(
                g, i, logits_i, tokens, beam_scores, pool, done)
        return (tokens, beam_scores, pool, done), None

    (tokens, beam_scores,
     (ps, pt, pl), done), _ = jax.lax.scan(
        step, (tokens0, beam_scores0,
               (pool_scores0, pool_tokens0, pool_lens0), done0),
        jnp.arange(1, L))

    # finalize: open beams of not-done batches join the pool, scored /L
    def fin(toks_b, bs_b, ps, pt, pl, dn):
        for k in range(N):
            ps, pt, pl = pool_add((ps, pt, pl), bs_b[k] / L, toks_b[k], L,
                                  ~dn)
        best = jnp.argmax(ps)
        hyp, ln = pt[best], pl[best]
        pos = jnp.arange(L)
        row = jnp.where(pos < ln, hyp, pad_id)
        row = jnp.where((pos == ln) & (ln < L), eos_token_id, row)
        return row

    return jax.vmap(fin)(tokens, beam_scores, ps, pt, pl, done)
