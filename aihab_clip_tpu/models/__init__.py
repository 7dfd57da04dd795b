from .clip import (
    CLIP_ARCHS,
    CLIPConfig,
    CLIPModel,
    config_from_state_dict_shapes,
)
from .convert import (
    cast_params,
    load_params_npz,
    save_params_npz,
    torch_state_dict_to_params,
)
from .layers import LayerNorm, quick_gelu
from .resnet import ModifiedResNet
from .text import TextTransformer
from .vit import VisionTransformer

__all__ = [
    "CLIP_ARCHS",
    "CLIPConfig",
    "CLIPModel",
    "config_from_state_dict_shapes",
    "cast_params",
    "load_params_npz",
    "save_params_npz",
    "torch_state_dict_to_params",
    "LayerNorm",
    "quick_gelu",
    "ModifiedResNet",
    "TextTransformer",
    "VisionTransformer",
]
