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
from .convnext import (
    ConvNeXtVisionTower,
    convnext_config_for_name,
    openclip_convnext_state_dict_to_params,
)
from .layers import LayerNorm, quick_gelu
from .text_head import (
    build_text_head,
    classifier_logits,
    compute_text_weights,
    l2_normalize,
)
from .zoo import CLIPBundle, available_models, load
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
