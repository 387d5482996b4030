"""Flax towers for the two plain-timm ViT variants among the vendored model
configs (reference wraps them via open_clip's timm adapter,
da-clip/src/open_clip/timm_model.py:68-105 — `timm_pool: ""`,
`timm_proj: "linear"`, i.e. trunk with its classifier reset keeping the
network-default pooling, then a bias-free adapter Linear to embed_dim):

  * vit_medium_patch16_gap_256 — timm VisionTransformer model def: width 512,
    depth 12, heads 8, patch 16 @ 256px, NO class token, global average
    pooling, qkv WITHOUT bias, LayerScale (init 1e-6), final norm BEFORE the
    pool (fc_norm=False).
  * vit_relpos_medium_patch16_cls_224 — timm VisionTransformerRelPos model
    def: width 512, depth 12, heads 8, patch 16 @ 224px, class token +
    'token' pooling, qkv without bias, LayerScale (VisionTransformerRelPos
    defaults init_values=1e-6, unlike plain VisionTransformer), NO absolute
    position embedding; each block's attention adds a relative-position bias
    produced by a small MLP over signed-log relative coordinates (timm
    RelPosMlp, mode='cr': 2 → ReLU(rel_pos_dim=256 per the model def) →
    heads, gathered into (N, N) by the standard relative-index table and
    zero-padded for the cls prefix).  rel_pos_dim=256 is the medium-variant
    constant in timm's vision_transformer_relpos.py (384 belongs to
    vit_srelpos_small_patch16_224, where it equals embed_dim); with zero
    egress this cannot be re-checked against a live timm install, so it is
    recorded here and guarded at load time as described below.

timm facts above (relpos init_values default, rel_pos_dim=256) are from the
timm source the reference pins transitively; timm itself is absent from this
image (zero egress), so they are additionally guarded at load time:
`utils/torch_convert.convert_timm_vit_visual` stacks whatever LayerScale /
RelPosMlp widths the checkpoint carries, and `TIMM_VIT_VARIANTS` is a
mutable registry — if a real checkpoint disagrees, loading fails loudly on
the shape mismatch and the table entry is the one-line fix.

timm itself is torch-only and absent from this image; parity is pinned
against a hand-written torch-functional oracle
(tests/parity/test_timm_vit_parity.py), same policy as models/convnext.py.

Blocks are identical per tower, so the stack is one `nn.scan` over stacked
parameters (the models/transformer.py TPU-first pattern).  The relpos bias
MLP runs *inside* the scan body on a constant coords table — 2×128×8 dots on
a (2g-1)² grid, negligible next to the attention matmuls.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from daclip_tpu.models.layers import LayerNorm

Dtype = Any

TIMM_VIT_VARIANTS = {
    "vit_medium_patch16_gap_256": dict(
        patch=16, width=512, depth=12, heads=8, mlp_ratio=4.0,
        qkv_bias=False, class_token=False, pool="avg", ls_init=1e-6,
        relpos=False),
    "vit_relpos_medium_patch16_cls_224": dict(
        patch=16, width=512, depth=12, heads=8, mlp_ratio=4.0,
        qkv_bias=False, class_token=True, pool="token", ls_init=1e-6,
        relpos=True, rel_pos_dim=256),
}


def relpos_index(grid: int) -> np.ndarray:
    """Standard relative-position index (Swin/BEiT construction): flat (N·N,)
    indices into the (2g-1)² relative-coordinate table."""
    coords = np.stack(np.meshgrid(np.arange(grid), np.arange(grid),
                                  indexing="ij")).reshape(2, -1)   # (2, N)
    rel = coords[:, :, None] - coords[:, None, :]                   # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int32)
    rel += grid - 1
    return (rel[..., 0] * (2 * grid - 1) + rel[..., 1]).reshape(-1)


def relpos_log_coords(grid: int) -> np.ndarray:
    """Signed-log relative coordinates, ((2g-1)², 2) f32 (timm
    gen_relative_log_coords, mode='cr': sign(c)·log(1+|c|))."""
    r = np.arange(-(grid - 1), grid, dtype=np.float32)
    ch, cw = np.meshgrid(r, r, indexing="ij")
    table = np.stack([ch, cw], axis=-1).reshape(-1, 2)
    return np.sign(table) * np.log1p(np.abs(table))


class TimmViTBlock(nn.Module):
    """Pre-norm timm Block / RelPosBlock, scan-compatible:
    (x, (coords, index)) -> (x, None)."""
    width: int
    heads: int
    hidden: int
    qkv_bias: bool = True
    ls_init: Optional[float] = None
    relpos: bool = False
    rel_pos_hidden: int = 128  # timm RelPosMlp hidden_dim default
    prefix_tokens: int = 0
    dtype: Dtype = jnp.float32

    def _ls(self, name):
        if self.ls_init is None:
            return lambda y: y
        gamma = self.param(name, nn.initializers.constant(self.ls_init),
                           (self.width,), jnp.float32)
        return lambda y: y * gamma.astype(y.dtype)

    @nn.compact
    def __call__(self, x, inputs):
        coords, index = inputs
        B, N, D = x.shape
        H, hd = self.heads, self.width // self.heads

        def attn(y):
            qkv = nn.Dense(3 * D, use_bias=self.qkv_bias, dtype=self.dtype,
                           param_dtype=jnp.float32, name="qkv")(y)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, N, H, hd)
            k = k.reshape(B, N, H, hd)
            v = v.reshape(B, N, H, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
            logits = logits * (hd ** -0.5)
            if self.relpos:
                # RelPosMlp 'cr': 2 -> ReLU(hidden) -> heads on log-coords,
                # gathered to (N, N), zero-padded over prefix tokens
                h1 = nn.relu(nn.Dense(self.rel_pos_hidden, dtype=jnp.float32,
                                      name="relpos_fc1")(coords))
                tab = nn.Dense(H, dtype=jnp.float32, name="relpos_fc2")(h1)
                np_ = N - self.prefix_tokens
                bias = tab[index].reshape(np_, np_, H).transpose(2, 0, 1)
                bias = jnp.pad(bias, ((0, 0), (self.prefix_tokens, 0),
                                      (self.prefix_tokens, 0)))
                logits = logits + bias[None]
            a = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", a, v).reshape(B, N, D)
            return nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                            name="proj")(out)

        def mlp(y):
            y = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                         name="mlp_fc1")(y)
            y = nn.gelu(y, approximate=False)
            return nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                            name="mlp_fc2")(y)

        x = x + self._ls("ls_1")(attn(LayerNorm(eps=1e-6, dtype=self.dtype,
                                                name="norm1")(x)))
        x = x + self._ls("ls_2")(mlp(LayerNorm(eps=1e-6, dtype=self.dtype,
                                               name="norm2")(x)))
        return x, None


class TimmViTTower(nn.Module):
    """Trunk (classifier reset, default pooling) + adapter projection
    (timm_model.py:82-99, proj='linear', proj_bias=False)."""
    model_name: str
    embed_dim: int
    image_size: int = 224
    pool: str = ""  # ""=network default; "avg"/"token" = reset_classifier override
    drop: float = 0.0
    remat: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, control=None, output_hiddens: bool = False,
                 train: bool = False):
        assert control is None and not output_hiddens, (
            "timm ViT towers have no controller wiring; the DA-CLIP "
            "controller requires the open_clip ViT vision tower")
        cfg = TIMM_VIT_VARIANTS[self.model_name]
        p, D = cfg["patch"], cfg["width"]
        B, H, W, C = x.shape
        gh, gw = H // p, W // p
        patches = x.reshape(B, gh, p, gw, p, C).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(B, gh * gw, p * p * C)
        kernel = self.param("patch_embed", nn.initializers.lecun_normal(),
                            (p * p * C, D), jnp.float32)
        pbias = self.param("patch_bias", nn.initializers.zeros, (D,), jnp.float32)
        x = patches @ kernel.astype(self.dtype) + pbias.astype(self.dtype)

        prefix = 0
        if cfg["class_token"]:
            cls = self.param("cls_token", nn.initializers.zeros, (D,), jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, D)), x], axis=1)
            prefix = 1
        coords = index = None
        if cfg["relpos"]:
            assert gh == gw, "relpos tower assumes a square grid"
            coords = jnp.asarray(relpos_log_coords(gh))
            index = jnp.asarray(relpos_index(gh))
        else:
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (gh * gw + prefix, D), jnp.float32)
            x = x + pos.astype(x.dtype)

        block_cls = TimmViTBlock
        if self.remat:
            block_cls = nn.remat(block_cls, prevent_cse=False)
        x, _ = nn.scan(
            block_cls,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=((nn.broadcast, nn.broadcast),),
            out_axes=0,
            length=cfg["depth"],
        )(width=D, heads=cfg["heads"], hidden=int(D * cfg["mlp_ratio"]),
          qkv_bias=cfg["qkv_bias"], ls_init=cfg["ls_init"],
          relpos=cfg["relpos"],
          rel_pos_hidden=cfg.get("rel_pos_dim") or 128,
          prefix_tokens=prefix, dtype=self.dtype,
          name="blocks")(x, (coords, index))

        x = LayerNorm(eps=1e-6, dtype=self.dtype, name="norm")(x)
        # non-empty pool = the reference's reset_classifier(global_pool=pool)
        # override (timm_model.py:82); "" keeps the network default
        pool = self.pool or cfg["pool"]
        if pool == "token" and not cfg["class_token"]:
            raise ValueError(
                f"pool='token' requires a class token; {self.model_name} "
                "has none (timm would fail the same way)")
        x = x[:, 0] if pool == "token" else jnp.mean(x[:, prefix:], axis=1)
        if train and self.drop > 0.0 and self.has_rng("dropout"):
            x = nn.Dropout(self.drop, deterministic=False)(x)
        return nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj")(x)
