"""Combined CLIP model (Flax): vision tower + text tower + logit scale.

Reference semantics: `/root/reference/clip/model.py:238-369`.  The
pre-projection feature contract is first-class here:

  * ``encode_image(params, images)``            -> pre-projection features
  * ``encode_image(params, images, project=True)`` -> (pre, projected)
  * ``encode_text(params, tokens)``             -> (pre, projected)

Architectures are described by ``CLIPConfig`` and can be inferred from a
torch checkpoint's tensor shapes (see ``config_from_state_dict_shapes``,
mirroring the reference's ``build_model`` inference at ``:396-419``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .resnet import ModifiedResNet
from .text import TextTransformer
from .vit import VisionTransformer

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int
    # vision
    image_resolution: int
    vision_layers: Union[Tuple[int, int, int, int], int]
    vision_width: int
    vision_patch_size: Optional[int]
    # text
    context_length: int
    vocab_size: int
    transformer_width: int
    transformer_heads: int
    transformer_layers: int
    # 0 = standard 4x MLP; ViT-g class towers use non-4x widths
    vision_mlp_dim: int = 0
    text_mlp_dim: int = 0
    # 0 = the width//64 rule; ViT-g uses 16 heads of width 88
    vision_heads_override: int = 0
    # MLP activation: OpenAI checkpoints are all QuickGELU
    # (`/root/reference/clip/model.py:160-162`); open_clip/LAION towers
    # default to exact GELU (open_clip marks QuickGELU variants with a
    # "-quickgelu" tag).  Not inferable from state-dict shapes — set by
    # the arch table / caller.
    act: str = "quick_gelu"
    # "" = legacy auto (ViT when vision_layers is an int, else
    # ModifiedResNet); "convnext" selects the ConvNeXt trunk with
    # vision_layers = stage depths and vision_width = stage-0 dim.
    vision_tower: str = ""
    # ConvNeXt head projection: "linear" | "mlp" (open_clip timm_proj)
    vision_proj: str = "linear"

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def tower(self) -> str:
        """Vision-tower family: 'vit' | 'rn' | 'convnext'."""
        if self.vision_tower:
            return self.vision_tower
        return "vit" if self.is_vit else "rn"

    @property
    def vision_heads(self) -> int:
        if self.vision_heads_override:
            return self.vision_heads_override
        if self.is_vit:
            return self.vision_width // 64
        return self.vision_width * 32 // 64

    @property
    def vision_preproj_dim(self) -> int:
        """Width of the pre-projection image feature."""
        if self.tower == "convnext":
            return self.vision_width * (2 ** (len(self.vision_layers) - 1))
        return self.vision_width if self.is_vit else self.vision_width * 32


# Named architectures of the OpenAI CLIP zoo (shape facts, public).
CLIP_ARCHS: Dict[str, CLIPConfig] = {
    "RN50": CLIPConfig(1024, 224, (3, 4, 6, 3), 64, None, 77, 49408, 512, 8, 12),
    "RN101": CLIPConfig(512, 224, (3, 4, 23, 3), 64, None, 77, 49408, 512, 8, 12),
    "RN50x4": CLIPConfig(640, 288, (4, 6, 10, 6), 80, None, 77, 49408, 640, 10, 12),
    "RN50x16": CLIPConfig(768, 384, (6, 8, 18, 8), 96, None, 77, 49408, 768, 12, 12),
    "RN50x64": CLIPConfig(1024, 448, (3, 15, 36, 10), 128, None, 77, 49408, 1024, 16, 12),
    "ViT-B/32": CLIPConfig(512, 224, 12, 768, 32, 77, 49408, 512, 8, 12),
    "ViT-B/16": CLIPConfig(512, 224, 12, 768, 16, 77, 49408, 512, 8, 12),
    "ViT-L/14": CLIPConfig(768, 224, 24, 1024, 14, 77, 49408, 768, 12, 12),
    "ViT-L/14@336px": CLIPConfig(768, 336, 24, 1024, 14, 77, 49408, 768, 12, 12),
    # development/smoke architecture (tiny but tokenizer-compatible)
    "Tiny": CLIPConfig(32, 32, 2, 64, 8, 77, 49408, 64, 1, 2),
    # tiny ModifiedResNet for tests (width 8 -> pool embed 256, 4 heads)
    "TinyRN": CLIPConfig(32, 32, (1, 1, 1, 1), 8, None, 77, 49408, 64, 1, 2),
    # open_clip-scale large towers (conversion via state-dict shape
    # inference; the ViT-g family uses a 4.36x MLP).  These are
    # LAION-trained archs — open_clip builds them with exact GELU
    # (QuickGELU only via explicit "-quickgelu" tags).
    "ViT-H/14": CLIPConfig(1024, 224, 32, 1280, 14, 77, 49408, 1024, 16, 24,
                           act="gelu"),
    "ViT-g/14": CLIPConfig(1024, 224, 40, 1408, 14, 77, 49408, 1024, 16, 24,
                           vision_mlp_dim=6144, vision_heads_override=16,
                           act="gelu"),
    "ViT-bigG/14": CLIPConfig(1280, 224, 48, 1664, 14, 77, 49408, 1280, 20,
                              32, vision_mlp_dim=8192,
                              vision_heads_override=16, act="gelu"),
    # tiny ConvNeXt for tests (width 16 -> pre-proj dim 128)
    "TinyConvNeXt": CLIPConfig(32, 32, (1, 1, 1, 1), 16, None, 77, 49408,
                               64, 1, 2, act="gelu", vision_tower="convnext"),
}
# The LAION ConvNeXt tag grid registers itself on import of
# ``models.convnext`` (models/__init__.py imports it) — the grid lives
# there to keep all ConvNeXt shape facts in one file.


class CLIPModel(nn.Module):
    config: CLIPConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False

    def setup(self):
        cfg = self.config
        if cfg.tower == "convnext":
            from .convnext import ConvNeXtVisionTower

            self.visual = ConvNeXtVisionTower(
                depths=tuple(cfg.vision_layers),
                width=cfg.vision_width,
                output_dim=cfg.embed_dim,
                proj=cfg.vision_proj,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )
        elif cfg.is_vit:
            self.visual = VisionTransformer(
                input_resolution=cfg.image_resolution,
                patch_size=cfg.vision_patch_size,
                width=cfg.vision_width,
                layers=cfg.vision_layers,
                heads=cfg.vision_heads,
                output_dim=cfg.embed_dim,
                mlp_dim=cfg.vision_mlp_dim,
                dtype=self.dtype, param_dtype=self.param_dtype,
                remat=self.remat, act=cfg.act,
            )
        else:
            self.visual = ModifiedResNet(
                layers=tuple(cfg.vision_layers),
                output_dim=cfg.embed_dim,
                heads=cfg.vision_heads,
                input_resolution=cfg.image_resolution,
                width=cfg.vision_width,
                dtype=self.dtype, param_dtype=self.param_dtype,
            )
        self.text = TextTransformer(
            context_length=cfg.context_length,
            vocab_size=cfg.vocab_size,
            width=cfg.transformer_width,
            layers=cfg.transformer_layers,
            heads=cfg.transformer_heads,
            embed_dim=cfg.embed_dim,
            mlp_dim=cfg.text_mlp_dim,
            act=cfg.act,
            dtype=self.dtype, param_dtype=self.param_dtype,
            remat=self.remat,
        )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, math.log(1 / 0.07), jnp.float32),
            (),
        )

    def encode_image(self, images: jax.Array, *, project: bool = False):
        """images: [B, H, W, 3] NHWC, normalized. Pre-projection by default."""
        return self.visual(images, project=project)

    def encode_text(self, tokens: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """tokens: [B, context] int32 -> (pre_projection, projected)."""
        return self.text(tokens)

    def __call__(self, images: jax.Array, tokens: jax.Array):
        """Contrastive logits (`/root/reference/clip/model.py:355-369`)."""
        _, image_features = self.visual(images, project=True)
        _, text_features = self.text(tokens)
        image_features = image_features / jnp.linalg.norm(
            image_features, axis=-1, keepdims=True)
        text_features = text_features / jnp.linalg.norm(
            text_features, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale).astype(image_features.dtype)
        logits_per_image = scale * image_features @ text_features.T
        return logits_per_image, logits_per_image.T


def config_from_state_dict_shapes(shapes: Dict[str, Tuple[int, ...]]) -> CLIPConfig:
    """Infer a CLIPConfig from a torch CLIP state dict's tensor shapes.

    ``shapes`` maps torch parameter names to shapes; works for both ViT and
    ModifiedResNet checkpoints (reference: ``build_model``,
    `/root/reference/clip/model.py:396-419`).
    """
    is_vit = "visual.proj" in shapes

    if is_vit:
        vision_width = shapes["visual.conv1.weight"][0]
        vision_layers = len({k.split(".")[3] for k in shapes
                             if k.startswith("visual.transformer.resblocks.")})
        vision_patch_size = shapes["visual.conv1.weight"][-1]
        grid = round((shapes["visual.positional_embedding"][0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        counts = []
        for stage in (1, 2, 3, 4):
            prefix = f"visual.layer{stage}."
            counts.append(len({k[len(prefix):].split(".")[0]
                               for k in shapes if k.startswith(prefix)}))
        vision_layers = tuple(counts)
        vision_width = shapes["visual.layer1.0.conv1.weight"][0]
        vision_patch_size = None
        out_width = round((shapes["visual.attnpool.positional_embedding"][0] - 1) ** 0.5)
        image_resolution = out_width * 32

    embed_dim = shapes["text_projection"][1]
    context_length = shapes["positional_embedding"][0]
    vocab_size = shapes["token_embedding.weight"][0]
    transformer_width = shapes["ln_final.weight"][0]
    transformer_layers = len({k.split(".")[2] for k in shapes
                              if k.startswith("transformer.resblocks.")})

    def mlp_dim_of(prefix: str, width: int) -> int:
        key = f"{prefix}.resblocks.0.mlp.c_fc.weight"
        if key in shapes and shapes[key][0] != 4 * width:
            return int(shapes[key][0])
        return 0

    vision_mlp = (mlp_dim_of("visual.transformer", int(vision_width))
                  if is_vit else 0)
    text_mlp = mlp_dim_of("transformer", int(transformer_width))

    cfg = CLIPConfig(
        embed_dim=int(embed_dim),
        image_resolution=int(image_resolution),
        vision_layers=(int(vision_layers) if is_vit
                       else tuple(int(c) for c in vision_layers)),
        vision_width=int(vision_width),
        vision_patch_size=(int(vision_patch_size) if vision_patch_size else None),
        context_length=int(context_length),
        vocab_size=int(vocab_size),
        transformer_width=int(transformer_width),
        transformer_heads=int(transformer_width) // 64,
        transformer_layers=int(transformer_layers),
        vision_mlp_dim=vision_mlp,
        text_mlp_dim=text_mlp,
    )

    # Head count and activation are NOT inferable from shapes (the in_proj
    # weight reshapes the same way for any head count), and the LAION
    # archs diverge from width//64 (ViT-g/bigG: 16 heads at widths
    # 1408/1664) and from QuickGELU.  When the inferred shapes exactly
    # match a registered arch, adopt its overrides so a file-path load of
    # a real H/g/bigG checkpoint builds the correct attention/activation
    # instead of a silently wrong width//64-head QuickGELU tower.
    for arch in CLIP_ARCHS.values():
        if (arch.vision_heads_override or arch.act != cfg.act) and all(
                getattr(arch, f) == getattr(cfg, f) for f in (
                    "embed_dim", "image_resolution", "vision_layers",
                    "vision_width", "vision_patch_size", "context_length",
                    "vocab_size", "transformer_width", "transformer_layers",
                    "vision_mlp_dim", "text_mlp_dim")):
            import dataclasses

            return dataclasses.replace(
                cfg, vision_heads_override=arch.vision_heads_override,
                act=arch.act, transformer_heads=arch.transformer_heads)
    return cfg
