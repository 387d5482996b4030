"""daclip_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
yeeecheng/DA-CLIP ("Controlling Vision-Language Models for Universal Image
Restoration", arXiv 2310.01018 + the numCLIP-style degradation-level regression fork).

Built from scratch for TPU:
  * flax.linen modules, params as pytrees, bf16 compute / f32 params,
  * the IR-SDE 100-step reverse loop is a single jitted `lax.scan`,
  * data-parallel scaling via `jax.sharding.Mesh` + GSPMD (no NCCL),
  * host-side numpy/cv2 data pipeline feeding double-buffered device batches.

Reference parity targets are cited throughout as `path:line` relative to the
upstream repo (mounted read-only during development; not required at runtime).
"""

__version__ = "0.1.0"

from daclip_tpu.sde.irsde import IRSDE  # noqa: F401
from daclip_tpu.factory import (create_loss, create_model,  # noqa: F401
                                create_model_and_transforms,
                                create_model_from_pretrained, get_tokenizer)
from daclip_tpu.models.pretrained import (list_pretrained,  # noqa: F401
                                          list_pretrained_tags_by_model)
