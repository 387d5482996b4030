from daclip_tpu.ops.conv3x3 import conv3x3_pallas, conv3x3_supported

__all__ = ["conv3x3_pallas", "conv3x3_supported"]
