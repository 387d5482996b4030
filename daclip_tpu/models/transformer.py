"""Transformer stacks for the CLIP vision/text towers and the DA-CLIP controller.

TPU-first design decisions (vs open_clip/transformer.py):
  * All L residual blocks are a single `nn.scan` over stacked parameters — one
    compiled block body instead of L unrolled ones (fast compile, identical math).
  * The DA-CLIP controller ("ControlTransformer", transformer.py:288-325) is the
    same scanned block with a zero-initialised per-layer Dense producing hiddens.
  * Control-state injection replicates the reference's `control.pop()` semantics
    EXACTLY (transformer.py:359-368): the main tower's block i adds the controller's
    hidden from block L-1-i.  Callers pass hiddens stacked (L, B, N, D); this module
    flips them.  Do not "fix" the order — pretrained DA-CLIP weights depend on it.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from daclip_tpu.models.layers import (CrossMultiheadAttention, LayerNorm, MLP,
                                      MultiheadAttention)

Dtype = Any


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block (open_clip/transformer.py:189-244), scan-compatible.

    As a scan body it maps (x, (ctrl, mask)) -> (x, hidden) where `hidden` is the
    per-layer output consumed by the DA-CLIP controller wiring:
      * controller=False: hidden = x after the block (transformer.py:365-366)
      * controller=True:  hidden = zero_linear(x)    (transformer.py:318-321)
    `ctrl` (if not None) is added AFTER the block output (transformer.py:367-368).
    """
    width: int
    heads: int
    mlp_ratio: float = 4.0
    quick_gelu: bool = False
    controller: bool = False
    ls_init_value: Optional[float] = None  # LayerScale (transformer.py:36-44)
    dtype: Dtype = jnp.float32

    def _ls(self, name):
        if self.ls_init_value is None:
            return lambda y: y
        gamma = self.param(name, nn.initializers.constant(self.ls_init_value),
                           (self.width,), jnp.float32)
        return lambda y: y * gamma.astype(y.dtype)

    @nn.compact
    def __call__(self, x, inputs):
        ctrl, mask = inputs
        x = x + self._ls("ls_1")(
            MultiheadAttention(self.width, self.heads, dtype=self.dtype,
                               name="attn")(LayerNorm(dtype=self.dtype,
                                                      name="ln_1")(x), mask))
        x = x + self._ls("ls_2")(
            MLP(self.width, int(self.width * self.mlp_ratio),
                quick_gelu=self.quick_gelu, dtype=self.dtype,
                name="mlp")(LayerNorm(dtype=self.dtype, name="ln_2")(x)))
        if self.controller:
            hidden = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32,
                              kernel_init=nn.initializers.zeros,
                              bias_init=nn.initializers.zeros,
                              name="zero_module")(x)
        else:
            hidden = x
        if ctrl is not None:
            x = x + ctrl
        return x, hidden


class Transformer(nn.Module):
    """L scanned residual blocks (open_clip/transformer.py:328-369).

    __call__(x, mask=None, control=None, output_hiddens=False)
      control: (L, B, N, D) stacked controller hiddens in *controller block order*;
               injected reversed (`control.pop()` parity — see module docstring).
      returns x or (x, hiddens (L, B, N, D)).
    """
    width: int
    layers: int
    heads: int
    mlp_ratio: float = 4.0
    quick_gelu: bool = False
    controller: bool = False
    ls_init_value: Optional[float] = None
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, control=None,
                 output_hiddens: bool = False):
        block_cls = ResidualAttentionBlock
        if self.remat:
            block_cls = nn.remat(block_cls, prevent_cse=False,
                                 static_argnums=())
        scan = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=((0 if control is not None else nn.broadcast, nn.broadcast),),
            out_axes=0,
            length=self.layers,
        )
        if control is not None:
            control = jnp.flip(control, axis=0).astype(x.dtype)
        x, hiddens = scan(
            width=self.width, heads=self.heads, mlp_ratio=self.mlp_ratio,
            quick_gelu=self.quick_gelu, controller=self.controller,
            ls_init_value=self.ls_init_value,
            dtype=self.dtype, name="resblocks")(x, (control, mask))
        if output_hiddens:
            return x, hiddens
        return x


def causal_mask(n: int) -> np.ndarray:
    """Additive causal mask (open_clip/transformer.py:631-637)."""
    mask = np.full((n, n), float("-inf"), dtype=np.float32)
    return np.triu(mask, 1)


class AttentionalPooler(nn.Module):
    """n_queries learned queries cross-attending over encoder tokens
    (open_clip/transformer.py:163-186).  Used by the CoCa vision tower."""
    d_model: int
    heads: int = 8
    n_queries: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        query = self.param("query", nn.initializers.normal(1.0),
                           (self.n_queries, self.d_model), jnp.float32)
        k = LayerNorm(dtype=self.dtype, name="ln_k")(x)
        q = LayerNorm(dtype=self.dtype, name="ln_q")(
            query.astype(self.dtype))
        q = jnp.broadcast_to(q[None], (B, self.n_queries, self.d_model))
        return CrossMultiheadAttention(self.d_model, self.heads,
                                       dtype=self.dtype, name="attn")(q, k)


class MultimodalBlock(nn.Module):
    """One CoCa decoder layer: causal self-attn resblock + cross-attn resblock
    over the image tokens (open_clip/transformer.py:710-721,757-767), scanned."""
    width: int
    heads: int
    mlp_ratio: float = 4.0
    quick_gelu: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, inputs):
        image_embs, mask = inputs
        x = x + MultiheadAttention(self.width, self.heads, dtype=self.dtype,
                                   name="attn")(
            LayerNorm(dtype=self.dtype, name="ln_1")(x), mask)
        x = x + MLP(self.width, int(self.width * self.mlp_ratio),
                    quick_gelu=self.quick_gelu, dtype=self.dtype,
                    name="mlp")(LayerNorm(dtype=self.dtype, name="ln_2")(x))
        kv = LayerNorm(dtype=self.dtype, name="cross_ln_1_kv")(image_embs)
        x = x + CrossMultiheadAttention(self.width, self.heads, dtype=self.dtype,
                                        name="cross_attn")(
            LayerNorm(dtype=self.dtype, name="cross_ln_1")(x), kv)
        x = x + MLP(self.width, int(self.width * self.mlp_ratio),
                    quick_gelu=self.quick_gelu, dtype=self.dtype,
                    name="cross_mlp")(
            LayerNorm(dtype=self.dtype, name="cross_ln_2")(x))
        return x, None


class MultimodalTransformer(nn.Module):
    """CoCa text decoder (open_clip/transformer.py:686-778): L scanned
    (self-attn, cross-attn) layer pairs over the caption tokens with the image
    tokens as cross-attention memory, then ln_final + projection to the vocab-
    sized logits space (output_dim = vocab_size for CoCa)."""
    width: int
    layers: int
    heads: int
    context_length: int = 77
    mlp_ratio: float = 4.0
    output_dim: int = 512
    quick_gelu: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embs, text_embs):
        L = text_embs.shape[1]
        mask = jnp.asarray(causal_mask(L))
        block_cls = MultimodalBlock
        if self.remat:
            block_cls = nn.remat(block_cls, prevent_cse=False)
        scan = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=((nn.broadcast, nn.broadcast),),
            out_axes=0,
            length=self.layers,
        )
        x, _ = scan(width=self.width, heads=self.heads, mlp_ratio=self.mlp_ratio,
                    quick_gelu=self.quick_gelu, dtype=self.dtype,
                    name="layers")(text_embs.astype(self.dtype),
                                   (image_embs.astype(self.dtype), mask))
        x = LayerNorm(dtype=self.dtype, name="ln_final")(x)
        proj = self.param("text_projection",
                          nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim), jnp.float32)
        return jnp.dot(x, proj.astype(x.dtype))


class VisionTransformer(nn.Module):
    """CLIP ViT (open_clip/transformer.py:372-555), NHWC input in [preprocessed]
    normalized float, patch embedding as an MXU matmul over unfolded patches
    (equivalent to the reference's stride-p conv, transformer.py:411,518-520).

    controller=True turns this tower into the DA-CLIP controller: per-block
    zero-Dense hiddens are returned when output_hiddens=True
    (daclip_model.py:22-23 wraps the copied tower in ControlTransformer).
    """
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512
    quick_gelu: bool = False
    controller: bool = False
    global_average_pool: bool = False
    # CoCa vision tower options (transformer.py:385-389,434-441)
    attentional_pool: bool = False
    n_queries: int = 256
    attn_pooler_heads: int = 8
    output_tokens: bool = False
    # PatchDropout https://arxiv.org/abs/2212.00794 (transformer.py:47-84,529):
    # train-time only, keeps max(1, int(n·(1-p))) random patch tokens, CLS kept.
    patch_dropout: float = 0.0
    ls_init_value: Optional[float] = None
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, control=None, output_hiddens: bool = False,
                 train: bool = False):
        B = x.shape[0]
        p = self.patch_size
        gh, gw = x.shape[1] // p, x.shape[2] // p
        n = gh * gw

        # patch embed: (B,H,W,3) -> (B, n, p*p*3) @ kernel  (== conv k=p stride=p)
        patches = x.reshape(B, gh, p, gw, p, 3)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(B, n, p * p * 3)
        kernel = self.param("conv1", nn.initializers.normal(self.width ** -0.5),
                            (p * p * 3, self.width), jnp.float32)
        h = jnp.dot(patches.astype(self.dtype), kernel.astype(self.dtype))

        cls = self.param("class_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (self.width,), jnp.float32)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(self.width ** -0.5),
                         (n + 1, self.width), jnp.float32)
        h = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (B, 1, self.width)), h], axis=1)
        h = h + pos.astype(self.dtype)

        if self.patch_dropout > 0.0 and train:
            # topk over gaussian noise = uniform random subset (reference :76-79)
            cls_tok, rest = h[:, :1], h[:, 1:]
            n_keep = max(1, int(rest.shape[1] * (1.0 - self.patch_dropout)))
            rand = jax.random.normal(self.make_rng("patch_dropout"),
                                     rest.shape[:2])
            _, keep_idx = jax.lax.top_k(rand, n_keep)
            rest = jnp.take_along_axis(rest, keep_idx[..., None], axis=1)
            h = jnp.concatenate([cls_tok, rest], axis=1)

        h = LayerNorm(dtype=self.dtype, name="ln_pre")(h)
        out = Transformer(self.width, self.layers, self.heads, self.mlp_ratio,
                          quick_gelu=self.quick_gelu, controller=self.controller,
                          ls_init_value=self.ls_init_value,
                          remat=self.remat, dtype=self.dtype, name="transformer")(
            h, mask=None, control=control, output_hiddens=output_hiddens)
        if output_hiddens:
            h, hiddens = out
        else:
            h = out

        if self.attentional_pool:
            # transformer.py:434-437,540-543: pool to n_queries tokens, ln_post
            # over ALL pooled tokens, first token is the contrastive latent
            h = AttentionalPooler(self.output_dim, self.attn_pooler_heads,
                                  self.n_queries, dtype=self.dtype,
                                  name="attn_pool")(h)
            h = LayerNorm(dtype=self.dtype, name="ln_post")(h)
            pooled, tokens = h[:, 0], h[:, 1:]
            proj = self.param("proj",
                              nn.initializers.normal(self.width ** -0.5),
                              (self.output_dim, self.output_dim), jnp.float32)
        else:
            if self.global_average_pool:
                pooled, tokens = h.mean(axis=1), h
            else:
                pooled, tokens = h[:, 0], h[:, 1:]
            pooled = LayerNorm(dtype=self.dtype, name="ln_post")(pooled)
            proj = self.param("proj",
                              nn.initializers.normal(self.width ** -0.5),
                              (self.width, self.output_dim), jnp.float32)
        pooled = jnp.dot(pooled, proj.astype(pooled.dtype))
        if self.output_tokens:
            return pooled, tokens
        if output_hiddens:
            return pooled, hiddens
        return pooled


class TextTransformer(nn.Module):
    """CLIP text tower (open_clip/transformer.py:558-683; also the inlined text
    stack of model.py:203-249).

    embed_cls=True is the CoCa variant: a learned CLS embedding is APPENDED to
    the sequence (num_pos = context_length+1), padding keys are masked for the
    CLS query only (build_cls_mask, transformer.py:641-648 — quirks replicated
    exactly), pooling reads the CLS position and ln_final is applied to the
    pooled latent only while the returned tokens stay un-normalised
    (transformer.py:673-676)."""
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    output_dim: int = 512
    quick_gelu: bool = False
    embed_cls: bool = False
    pad_id: int = 0
    output_tokens: bool = False
    remat: bool = False
    dtype: Dtype = jnp.float32

    def _cls_mask(self, text, L):
        """build_cls_mask (transformer.py:641-648): only the (appended) CLS
        query masks padding keys; all other query rows are left fully open.
        Key column 0 is force-open and the (text != pad) row is shifted right
        by one — the reference's F.pad((1,0)) layout, replicated verbatim."""
        B = text.shape[0]
        keys_open = jnp.concatenate(
            [jnp.ones((B, 1), bool), text != self.pad_id], axis=-1)  # (B, L+1)
        cls_row = jnp.where(keys_open, 0.0, float("-inf"))[:, :L + 1]
        full = jnp.zeros((B, L + 1, L + 1), jnp.float32)
        full = full.at[:, -1, :].set(cls_row)
        return full[:, None]  # (B, 1, L+1, L+1) broadcast over heads

    @nn.compact
    def __call__(self, text, embed_cls: Optional[bool] = None):
        # text: (B, L) int32 token ids
        use_cls = self.embed_cls if embed_cls is None else embed_cls
        L = text.shape[1]
        num_pos = self.context_length + (1 if self.embed_cls else 0)
        tok = self.param("token_embedding", nn.initializers.normal(0.02),
                         (self.vocab_size, self.width), jnp.float32)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (num_pos, self.width), jnp.float32)
        if self.embed_cls:
            cls_emb = self.param("cls_emb", nn.initializers.normal(0.01),
                                 (self.width,), jnp.float32)
        x = jnp.take(tok, text, axis=0).astype(self.dtype)
        if use_cls:
            B = x.shape[0]
            x = jnp.concatenate(
                [x, jnp.broadcast_to(cls_emb.astype(self.dtype),
                                     (B, 1, self.width))], axis=1)
            seq = L + 1
            mask = jnp.asarray(causal_mask(seq))[None, None] + self._cls_mask(text, L)
        else:
            seq = L
            mask = jnp.asarray(causal_mask(seq))
        x = x + pos[:seq].astype(self.dtype)
        x = Transformer(self.width, self.layers, self.heads, self.mlp_ratio,
                        quick_gelu=self.quick_gelu, remat=self.remat,
                        dtype=self.dtype, name="transformer")(x, mask=mask)
        if use_cls:
            pooled, tokens = x[:, -1], x[:, :-1]
            pooled = LayerNorm(dtype=self.dtype, name="ln_final")(pooled)
        else:
            x = LayerNorm(dtype=self.dtype, name="ln_final")(x)
            # EOT pooling: highest token id marks end of text (transformer.py:675)
            eot = jnp.argmax(text, axis=-1)
            pooled, tokens = x[jnp.arange(x.shape[0]), eot], x
        proj = self.param("text_projection",
                          nn.initializers.normal(self.width ** -0.5),
                          (self.width, self.output_dim), jnp.float32)
        pooled = jnp.dot(pooled, proj.astype(pooled.dtype))
        if self.output_tokens:
            return pooled, tokens
        return pooled
