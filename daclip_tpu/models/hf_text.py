"""HuggingFace text-encoder tower — open_clip/hf_model.py:46-193 parity via
transformers' Flax models (no torch in the compute path).

Supports the reference's pooler types (hf_model.py:66-104):
  * mean_pooler — masked mean of last hidden states
  * cls_pooler  — first token
  * max_pooler  — masked max
and projections (hf_model.py:141-155): 'linear' or 'mlp'
(Linear→GELU→Linear with hidden = (d_model+output_dim)//2, bias-free).

Usage: wrap an instantiated Flax HF model (built from a local config or local
pretrained weights — this environment has no network egress):

    from transformers import BertConfig, FlaxBertModel
    hf = FlaxBertModel(BertConfig(...), seed=0)
    tower = HFTextTower(hf, output_dim=512, pooler_type="mean_pooler")
    params = tower.init_params(jax.random.PRNGKey(0))
    feats = tower.encode(params, input_ids)
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class _Projection(nn.Module):
    output_dim: int
    proj: str = "mlp"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.proj == "linear":
            return nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32, name="proj")(x)
        hidden = (x.shape[-1] + self.output_dim) // 2
        x = nn.Dense(hidden, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="fc2")(x)


def pool(hidden, attention_mask, pooler_type: str = "mean_pooler"):
    mask = attention_mask[..., None].astype(hidden.dtype)
    if pooler_type == "mean_pooler":
        return (hidden * mask).sum(1) / jnp.maximum(mask.sum(1), 1e-6)
    if pooler_type == "cls_pooler":
        return hidden[:, 0]
    if pooler_type == "max_pooler":
        neg = jnp.finfo(hidden.dtype).min
        return jnp.where(mask > 0, hidden, neg).max(axis=1)
    raise ValueError(pooler_type)


class HFTextTower:
    """Functional wrapper: HF Flax encoder + pooler + projection."""

    def __init__(self, hf_model, output_dim: int,
                 pooler_type: str = "mean_pooler", proj: str = "mlp",
                 pad_id: int = 0):
        self.hf = hf_model
        self.output_dim = output_dim
        self.pooler_type = pooler_type
        self.pad_id = pad_id
        self.projection = _Projection(output_dim, proj)

    def init_params(self, rng):
        d_model = self.hf.config.hidden_size
        proj_params = self.projection.init(rng, jnp.zeros((1, d_model)))
        return {"hf": self.hf.params, "proj": proj_params}

    def encode(self, params, input_ids, normalize: bool = False):
        attention_mask = (input_ids != self.pad_id).astype(jnp.int32)
        out = self.hf(input_ids, attention_mask=attention_mask,
                      params=params["hf"])
        pooled = pool(out.last_hidden_state, attention_mask, self.pooler_type)
        feats = self.projection.apply(params["proj"], pooled)
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return feats
