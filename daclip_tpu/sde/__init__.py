from daclip_tpu.sde.irsde import IRSDE, make_schedule

__all__ = ["IRSDE", "make_schedule"]
