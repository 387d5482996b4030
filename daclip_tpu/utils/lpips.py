"""LPIPS(alex) perceptual metric in JAX — weights-optional.

The reference evaluates LPIPS with the `lpips` pip package (test.py:82,164),
whose AlexNet + linear-head weights are downloaded at install time.  This
environment has no network egress and no lpips package, so:

  * `LPIPS` implements the exact computation (AlexNet features at 5 taps,
    unit-normalize channels, 1x1 linear heads, spatial mean, sum over taps),
  * weights must be supplied as an .npz converted ONCE from a torch lpips
    checkpoint via `convert_lpips_torch(...)` on a machine that has them,
  * without weights the eval CLIs simply skip LPIPS (documented omission,
    SURVEY.md §7 hard parts).

Input convention matches lpips: RGB HWC float in [-1, 1].
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jax = None

# AlexNet conv stack config: (out_ch, kernel, stride, pad) with ReLU after each;
# maxpool(3,2) after convs 1, 2 and 5.
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1), (256, 3, 1, 1),
         (256, 3, 1, 1)]
_POOL_AFTER = {0, 1, 4}
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, weights: Dict[str, np.ndarray]):
        """weights keys: conv{i}_w (HWIO), conv{i}_b, lin{i}_w (1,1,C,1)."""
        self.w = {k: jnp.asarray(v) for k, v in weights.items()}
        self._fn = jax.jit(self._distance)

    @classmethod
    def from_npz(cls, path: str) -> "LPIPS":
        return cls(dict(np.load(path)))

    def _features(self, x):
        # x: (B,H,W,3) in [-1,1]; lpips scaling layer
        h = (x - _SHIFT) / _SCALE
        feats = []
        for i, (c, k, s, p) in enumerate(_ALEX):
            h = jax.lax.conv_general_dilated(
                h, self.w[f"conv{i}_w"], (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            h = h + self.w[f"conv{i}_b"]
            h = jax.nn.relu(h)
            feats.append(h)
            if i in _POOL_AFTER:
                h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max,
                                          (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
        return feats

    def _distance(self, a, b):
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            lin = self.w[f"lin{i}_w"]              # (1,1,C,1), non-negative
            d = jax.lax.conv_general_dilated(
                d, lin, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            total = total + d.mean(axis=(1, 2, 3))
        return total

    def __call__(self, img_a: np.ndarray, img_b: np.ndarray) -> np.ndarray:
        """img_*: HWC or BHWC RGB in [-1,1]."""
        a = jnp.asarray(img_a, jnp.float32)
        b = jnp.asarray(img_b, jnp.float32)
        if a.ndim == 3:
            a, b = a[None], b[None]
        return np.asarray(self._fn(a, b))


def convert_lpips_torch(out_path: str):  # pragma: no cover (needs lpips wheels)
    """One-time converter: run where `lpips` + torchvision AlexNet weights exist.

    import lpips, torch
    m = lpips.LPIPS(net='alex')
    → saves conv{i}_w/b from m.net.slice*, lin{i}_w from m.lin{i}.model[1].weight
    """
    import torch
    import lpips as lpips_pkg

    m = lpips_pkg.LPIPS(net="alex")
    out = {}
    convs = [l for l in m.net.modules() if isinstance(l, torch.nn.Conv2d)]
    for i, c in enumerate(convs[:5]):
        out[f"conv{i}_w"] = c.weight.detach().numpy().transpose(2, 3, 1, 0)
        out[f"conv{i}_b"] = c.bias.detach().numpy()
    for i in range(5):
        lin = getattr(m, f"lin{i}").model[1]
        out[f"lin{i}_w"] = lin.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.savez(out_path, **out)
    return out_path
