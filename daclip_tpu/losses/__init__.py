from daclip_tpu.losses.clip_loss import (clip_loss, coca_loss,
                                         daclip_loss_fork, daclip_loss_uir,
                                         distill_clip_loss, fcrc_loss)
from daclip_tpu.losses.matching import matching_loss

__all__ = ["clip_loss", "coca_loss", "daclip_loss_uir", "daclip_loss_fork",
           "distill_clip_loss", "fcrc_loss", "matching_loss"]
