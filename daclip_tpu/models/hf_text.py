"""HuggingFace text-encoder tower — open_clip/hf_model.py:46-193 parity via
transformers' Flax models (no torch in the compute path).

Supports every reference pooler type (hf_model.py:43-104):
  * mean_pooler — masked mean of last hidden states
  * max_pooler  — masked max
  * cls_pooler  — the transformer's pooler_output when the wrapped model has a
    pooling head, else the first token (ClsPooler.use_pooler_output semantics)
  * cls_last_hidden_state_pooler — always the first token of the last hidden
    state (hf_model.py:83-104)
projections (hf_model.py:141-155): None (identity when d_model == output_dim),
'linear', or 'mlp' (Linear→GELU→Linear, hidden = (d_model+output_dim)//2,
bias-free), and `output_tokens` (hf_model.py:157-168: cls_pooler drops the CLS
position from the returned token sequence).

ARCH_DICT mirrors hf_configs.py:5-45 — per-model_type config-key names and the
default pooler — and drives `HFTextTower.from_config` (the analogue of
hf_model.py:108-139's AutoModel construction; this environment has no network
egress, so configs/weights must be local):

    tower = HFTextTower.from_config(BertConfig(...), output_dim=512)
    tower = HFTextTower.from_config("/path/to/local/model_dir", output_dim=512)

or wrap an already-instantiated Flax HF model:

    hf = FlaxBertModel(BertConfig(...), seed=0)
    tower = HFTextTower(hf, output_dim=512, pooler_type="mean_pooler")
    params = tower.init_params(jax.random.PRNGKey(0))
    feats = tower.encode(params, input_ids)

`lock_mask` is the functional analogue of HFTextEncoder.lock
(hf_model.py:170-186): instead of flipping requires_grad it returns a boolean
pytree (True = trainable) for optax.masked / train/locking.py partitions.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# hf_configs.py:5-45 parity: per-model_type config-attribute names + default
# pooler.  layer_attr / token_embeddings_attr name the torch module attributes
# upstream; here they name the flax param-tree components used by lock_mask.
ARCH_DICT = {
    "roberta": {
        "config_names": {
            "context_length": "max_position_embeddings",
            "vocab_size": "vocab_size",
            "width": "hidden_size",
            "heads": "num_attention_heads",
            "layers": "num_hidden_layers",
            "layer_attr": "layer",
            "token_embeddings_attr": "embeddings",
        },
        "pooler": "mean_pooler",
    },
    "xlm-roberta": {
        "config_names": {
            "context_length": "max_position_embeddings",
            "vocab_size": "vocab_size",
            "width": "hidden_size",
            "heads": "num_attention_heads",
            "layers": "num_hidden_layers",
            "layer_attr": "layer",
            "token_embeddings_attr": "embeddings",
        },
        "pooler": "mean_pooler",
    },
    "mt5": {
        "config_names": {
            # unlimited seqlen upstream (hf_configs.py:33-36)
            "context_length": "",
            "vocab_size": "vocab_size",
            "width": "d_model",
            "heads": "num_heads",
            "layers": "num_layers",
            "layer_attr": "block",
            "token_embeddings_attr": "embed_tokens",
        },
        "pooler": "mean_pooler",
    },
    "bert": {
        "config_names": {
            "context_length": "max_position_embeddings",
            "vocab_size": "vocab_size",
            "width": "hidden_size",
            "heads": "num_attention_heads",
            "layers": "num_hidden_layers",
            "layer_attr": "layer",
            "token_embeddings_attr": "embeddings",
        },
        "pooler": "cls_pooler",
    },
    # t5 shares mt5's layout (transformers model_type differs)
    "t5": {
        "config_names": {
            "context_length": "",
            "vocab_size": "vocab_size",
            "width": "d_model",
            "heads": "num_heads",
            "layers": "num_layers",
            "layer_attr": "block",
            "token_embeddings_attr": "embed_tokens",
        },
        "pooler": "mean_pooler",
    },
}

POOLERS = ("mean_pooler", "max_pooler", "cls_pooler",
           "cls_last_hidden_state_pooler")


class _Projection(nn.Module):
    output_dim: int
    proj: Optional[str] = "mlp"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.proj is None:  # identity (hf_model.py:142-143)
            return x
        if self.proj == "linear":
            return nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32, name="proj")(x)
        hidden = (x.shape[-1] + self.output_dim) // 2
        x = nn.Dense(hidden, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.output_dim, use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="fc2")(x)


def pool(out, attention_mask, pooler_type: str = "mean_pooler"):
    """Pool a model output (or raw [B,N,D] hidden array) — hf_model.py:43-104.

    `cls_pooler` prefers the transformer's pooler_output when the wrapped
    model carries a pooling head (ClsPooler.use_pooler_output=True,
    hf_model.py:66-81); `cls_last_hidden_state_pooler` never does."""
    hidden = getattr(out, "last_hidden_state", out)
    mask = attention_mask[..., None].astype(hidden.dtype)
    if pooler_type == "mean_pooler":
        return (hidden * mask).sum(1) / jnp.maximum(mask.sum(1), 1e-6)
    if pooler_type == "cls_pooler":
        pooled = getattr(out, "pooler_output", None)
        return pooled if pooled is not None else hidden[:, 0]
    if pooler_type == "cls_last_hidden_state_pooler":
        return hidden[:, 0]
    if pooler_type == "max_pooler":
        # deliberate fix of an upstream bug: hf_model.py:59 masked_fill's the
        # VALID positions (mask==1 → filled with -inf), i.e. it maxes over
        # padding; here the max runs over the valid tokens
        neg = jnp.finfo(hidden.dtype).min
        return jnp.where(mask > 0, hidden, neg).max(axis=1)
    raise ValueError(f"unknown pooler {pooler_type!r}; one of {POOLERS}")


def _arch(config):
    model_type = getattr(config, "model_type", None)
    if model_type not in ARCH_DICT:
        raise ValueError(f"unsupported HF model_type {model_type!r}; "
                         f"known: {sorted(ARCH_DICT)}")
    return ARCH_DICT[model_type]


class HFTextTower:
    """Functional wrapper: HF Flax encoder + pooler + projection."""

    def __init__(self, hf_model, output_dim: int,
                 pooler_type: Optional[str] = None, proj: Optional[str] = "mlp",
                 pad_id: Optional[int] = None):
        self.hf = hf_model
        self.config = hf_model.config
        arch = _arch(self.config)
        self.output_dim = output_dim
        # default pooler from the arch table (hf_model.py:132-133)
        self.pooler_type = pooler_type or arch["pooler"]
        if self.pooler_type not in POOLERS:
            raise ValueError(f"unknown pooler {self.pooler_type!r}")
        pad = pad_id if pad_id is not None else getattr(
            self.config, "pad_token_id", None)
        self.pad_id = 0 if pad is None else int(pad)
        # downstream-attr parity (hf_model.py:135-137)
        self.vocab_size = getattr(self.config, "vocab_size", 0)
        self.context_length = getattr(
            self.config, "max_position_embeddings", 0)
        d_model = getattr(self.config, arch["config_names"]["width"])
        if proj is None and d_model != output_dim:
            raise ValueError(f"proj=None needs d_model == output_dim "
                             f"({d_model} != {output_dim})")
        self.projection = _Projection(output_dim, proj)
        self._encoder_decoder = bool(
            getattr(self.config, "is_encoder_decoder", False))

    @classmethod
    def from_config(cls, config, output_dim: int,
                    pooler_type: Optional[str] = None,
                    proj: Optional[str] = "mlp", seed: int = 0,
                    pad_id: Optional[int] = None, **model_kwargs):
        """Build the Flax model from a transformers config (hf_model.py:108-131
        analogue, local-only: a PretrainedConfig, a dict with 'model_type', or
        a path to a local config/model directory — never a hub download)."""
        from transformers import AutoConfig, FlaxAutoModel

        if isinstance(config, dict):
            config = AutoConfig.for_model(config.pop("model_type"), **config)
        elif isinstance(config, str):
            config = AutoConfig.from_pretrained(config,
                                                local_files_only=True)
        arch = _arch(config)
        wants_transformer_pooler = (
            (pooler_type or arch["pooler"]) == "cls_pooler")
        if not getattr(config, "is_encoder_decoder", False):
            try:
                hf = FlaxAutoModel.from_config(
                    config, seed=seed,
                    add_pooling_layer=wants_transformer_pooler, **model_kwargs)
            except TypeError:  # model class without a pooling head knob
                hf = FlaxAutoModel.from_config(config, seed=seed,
                                               **model_kwargs)
        else:
            hf = FlaxAutoModel.from_config(config, seed=seed, **model_kwargs)
        return cls(hf, output_dim, pooler_type=pooler_type, proj=proj,
                   pad_id=pad_id)

    def init_params(self, rng):
        arch = _arch(self.config)
        d_model = getattr(self.config, arch["config_names"]["width"])
        proj_params = self.projection.init(rng, jnp.zeros((1, d_model)))
        return {"hf": self.hf.params, "proj": proj_params}

    def _forward(self, params, input_ids, attention_mask):
        if self._encoder_decoder:
            # encoder side only (hf_model.py:124-126 takes .encoder)
            return self.hf.encode(input_ids, attention_mask=attention_mask,
                                  params=params)
        return self.hf(input_ids, attention_mask=attention_mask,
                       params=params)

    def encode(self, params, input_ids, normalize: bool = False,
               output_tokens: bool = False):
        attention_mask = (input_ids != self.pad_id).astype(jnp.int32)
        out = self._forward(params["hf"], input_ids, attention_mask)
        pooled = pool(out, attention_mask, self.pooler_type)
        feats = self.projection.apply(params["proj"], pooled)
        if normalize:
            feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        if output_tokens:
            hidden = out.last_hidden_state
            if self.pooler_type == "cls_pooler":
                # exact type-check parity (hf_model.py:161-166): ClsPooler
                # drops the CLS position; ClsLastHiddenStatePooler does NOT
                hidden = hidden[:, 1:, :]
            return feats, hidden
        return feats

    def lock_mask(self, params, unlocked_layers: int = 0,
                  freeze_layer_norm: bool = True):
        """Trainable-mask pytree for HFTextEncoder.lock (hf_model.py:170-186):
        unlocked_layers=0 freezes the whole tower; otherwise the token
        embeddings and all but the last `unlocked_layers` encoder layers are
        frozen.  LayerNorm params inside frozen modules stay trainable when
        freeze_layer_norm=False.  The projection is always trainable (lock
        only touches self.transformer upstream)."""
        from flax.traverse_util import flatten_dict, unflatten_dict

        arch = _arch(self.config)["config_names"]
        n_layers = getattr(self.config, arch["layers"])
        layer_attr = arch["layer_attr"]
        emb_names = {arch["token_embeddings_attr"], "embeddings", "shared",
                     "embed_tokens"}
        ln_names = {"LayerNorm", "layer_norm", "layernorm",
                    "final_layer_norm", "layer_normalization"}

        def trainable(path) -> bool:
            is_ln = any(p in ln_names for p in path)
            if unlocked_layers == 0:
                frozen = True  # full freeze (hf_model.py:171-174)
            else:
                frozen = False
                if path and path[0] in emb_names:
                    frozen = True
                for i, p in enumerate(path[:-1]):
                    if p == layer_attr and path[i + 1].isdigit():
                        frozen = int(path[i + 1]) < n_layers - unlocked_layers
                        break
            if frozen and is_ln and not freeze_layer_norm:
                return True
            return not frozen

        flat = flatten_dict(params["hf"])
        hf_mask = unflatten_dict({k: trainable([str(p) for p in k])
                                  for k in flat})
        proj_mask = jax.tree.map(lambda _: True, params["proj"])
        return {"hf": hf_mask, "proj": proj_mask}
