"""Zero-shot classification utilities.

Reference: open_clip/zero_shot_classifier.py:21-69 (classifier from
classname×template text features) and training/zero_shot.py:18-84 (ImageNet
top1/top5).  ImageNet classnames + the 80 OpenAI templates are vendored as a JSON
data asset (extracted from open_clip/zero_shot_metadata.py)."""
from __future__ import annotations

import json
import os
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_ASSET = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      "assets", "zero_shot_metadata.json")


def load_imagenet_metadata():
    with open(_ASSET) as f:
        d = json.load(f)
    return d["imagenet_classnames"], d["openai_imagenet_templates"]


def build_zero_shot_classifier(encode_text: Callable, tokenizer: Callable,
                               classnames: Sequence[str],
                               templates: Sequence[str],
                               num_classes_per_batch: Optional[int] = 10
                               ) -> jnp.ndarray:
    """Returns (D, num_classes) classifier of mean-pooled normalized template
    embeddings (zero_shot_classifier.py:21-69); text encoding is batched."""
    weights = []
    bs = num_classes_per_batch or len(classnames)
    for i in range(0, len(classnames), bs):
        chunk = classnames[i: i + bs]
        texts = [t.replace("{}", c) if "{}" in t else t.format(c)
                 for c in chunk for t in templates]
        toks = jnp.asarray(tokenizer(texts))
        emb = encode_text(toks)                       # (C*T, D) normalized
        emb = emb.reshape(len(chunk), len(templates), -1).mean(axis=1)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        weights.append(emb)
    return jnp.concatenate(weights, axis=0).T          # (D, num_classes)


def accuracy(logits: np.ndarray, target: np.ndarray, topk=(1,)) -> List[float]:
    """top-k accuracies (training/zero_shot.py:12-15)."""
    order = np.argsort(-logits, axis=-1)
    return [float(np.mean([t in order[i, :k] for i, t in enumerate(target)]))
            for k in topk]
