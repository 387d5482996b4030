from daclip_tpu.models.clip import (CLIP, CLIPCfg, DaCLIP,
                                    MultiTypeDegradationPredictor, TextCfg,
                                    VisionCfg, add_model_config,
                                    get_model_config, list_models)
from daclip_tpu.models.transformer import (TextTransformer, Transformer,
                                           VisionTransformer)

__all__ = [
    "CLIP", "CLIPCfg", "DaCLIP", "MultiTypeDegradationPredictor",
    "TextCfg", "VisionCfg", "add_model_config", "get_model_config", "list_models",
    "TextTransformer", "Transformer", "VisionTransformer",
]
