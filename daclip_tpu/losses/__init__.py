from daclip_tpu.losses.clip_loss import (clip_loss, daclip_loss_fork,
                                         daclip_loss_uir, fcrc_loss)
from daclip_tpu.losses.matching import matching_loss

__all__ = ["clip_loss", "daclip_loss_uir", "daclip_loss_fork", "fcrc_loss",
           "matching_loss"]
