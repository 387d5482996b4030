from daclip_tpu.models.clip import (CLIP, CLIPCfg, CustomTextCLIP, DaCLIP,
                                    MultiTypeDegradationPredictor, TextCfg,
                                    VisionCfg, add_model_config,
                                    get_model_config, list_models)
from daclip_tpu.models.coca import CoCa, CoCaCfg, MultimodalCfg
from daclip_tpu.models.coca import generate as coca_generate
from daclip_tpu.models.coca import generate_beam as coca_generate_beam
from daclip_tpu.models.transformer import (AttentionalPooler,
                                           MultimodalTransformer,
                                           TextTransformer, Transformer,
                                           VisionTransformer)

__all__ = [
    "CLIP", "CLIPCfg", "CustomTextCLIP", "DaCLIP", "MultiTypeDegradationPredictor",
    "TextCfg", "VisionCfg", "add_model_config", "get_model_config", "list_models",
    "CoCa", "CoCaCfg", "MultimodalCfg", "coca_generate", "coca_generate_beam",
    "AttentionalPooler", "MultimodalTransformer",
    "TextTransformer", "Transformer", "VisionTransformer",
]
