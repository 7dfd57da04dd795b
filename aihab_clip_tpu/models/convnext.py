"""ConvNeXt-CLIP vision tower (Flax) + open_clip checkpoint converter.

The reference's openclip backend accepts any open_clip model tag
(`/root/reference/aihab_utils/model_init.py:42-112`), including the LAION
ConvNeXt-CLIP family (``convnext_base_w``, ``convnext_large_d[_320]``,
``convnext_xxlarge``).  This module supplies that family TPU-natively:

* :class:`ConvNeXtVisionTower` — NHWC Flax ConvNeXt trunk + CLIP head.
  Convolutions are XLA's home turf on TPU (like the ModifiedResNet tower,
  PERF_NOTES "RN50 encode"), so the canonical XLA lowering IS the fast
  path — ``encode_image_fastest`` routes non-ViT towers there.
* ``convnext_config_for_name`` — parses the open_clip/LAION tag grid to a
  ``CLIPConfig`` (shape facts from the public open_clip model configs).
* ``openclip_convnext_state_dict_to_params`` — converts an open_clip
  ``CLIP-convnext_*`` torch state dict (``visual.trunk.*`` timm naming +
  OpenAI-style text tower keys) to this model's param tree, inferring the
  config from tensor shapes (authoritative over the tag table when real
  weights are present).

Block semantics (timm ConvNeXt, channels-last): depthwise 7x7 conv ->
LayerNorm(eps 1e-6) -> Linear 4C -> exact GELU -> Linear C -> layer-scale
gamma -> residual.  The CLIP head global-average-pools, LayerNorms, then
projects (``linear`` for _w/base/xxlarge variants; 2*embed-hidden ``mlp``
for the _d variants).  Pre-projection feature = the post-LN pooled vector
(the framework-wide pre-projection contract, PARITY.md #4).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import LayerNorm

Dtype = Any


class ConvNeXtBlock(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        x = nn.Conv(self.dim, (7, 7), padding="SAME",
                    feature_group_count=self.dim, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="dwconv")(x)
        x = LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype,
                      name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)   # timm nn.GELU = exact erf
        x = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="fc2")(x)
        gamma = self.param("gamma",
                           nn.initializers.constant(1e-6),
                           (self.dim,), self.param_dtype)
        return residual + x * gamma.astype(x.dtype)


class ConvNeXtVisionTower(nn.Module):
    """ConvNeXt trunk + CLIP projection head.

    ``__call__(x, project=False)`` returns the pre-projection pooled
    feature (``dims[-1]`` wide); ``project=True`` returns
    ``(pre, projected)`` — the same contract as the ViT/RN towers.
    """

    depths: Tuple[int, ...]
    width: int                      # stage-0 dim; stage s has width * 2**s
    output_dim: int
    proj: str = "linear"            # "linear" | "mlp" (open_clip timm_proj)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, project: bool = False):
        dims = [self.width * (2 ** i) for i in range(len(self.depths))]
        x = x.astype(self.dtype)
        x = nn.Conv(dims[0], (4, 4), strides=(4, 4), padding="VALID",
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="stem_conv")(x)
        x = LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype,
                      name="stem_norm")(x)
        for s, depth in enumerate(self.depths):
            if s:
                x = LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype,
                              name=f"down_norm_{s}")(x)
                x = nn.Conv(dims[s], (2, 2), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, param_dtype=self.param_dtype,
                            name=f"down_conv_{s}")(x)
            for b in range(depth):
                x = ConvNeXtBlock(dims[s], dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name=f"stage{s}_block{b}")(x)
        x = jnp.mean(x, axis=(1, 2))                      # global avg pool
        pre = LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype,
                        name="head_norm")(x)
        if not project:
            return pre
        if self.proj == "mlp":
            y = nn.Dense(2 * self.output_dim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="head_fc1")(pre)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.output_dim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="head_fc2")(y)
        else:
            y = nn.Dense(self.output_dim, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="head_proj")(pre)
        return pre, y


# ---------------------------------------------------------------------------
# tag grid
# ---------------------------------------------------------------------------

# (embed_dim, resolution, width, depths, text_width, text_heads,
#  text_layers, proj) — shape facts from the public open_clip model
# configs; when real weights load, the shape-inferring converter below is
# authoritative and any table drift surfaces as a param-shape mismatch.
_CONVNEXT_GRID: Dict[str, tuple] = {
    "convnext_base":        (512, 224, 128, (3, 3, 27, 3), 512, 8, 12,
                             "linear"),
    "convnext_base_w":      (640, 256, 128, (3, 3, 27, 3), 640, 10, 12,
                             "linear"),
    "convnext_base_w_320":  (640, 320, 128, (3, 3, 27, 3), 640, 10, 12,
                             "linear"),
    "convnext_large_d":     (768, 256, 192, (3, 3, 27, 3), 768, 12, 16,
                             "mlp"),
    "convnext_large_d_320": (768, 320, 192, (3, 3, 27, 3), 768, 12, 16,
                             "mlp"),
    "convnext_xxlarge":     (1024, 256, 384, (3, 4, 30, 3), 1024, 16, 24,
                             "linear"),
}


def register_convnext_archs() -> None:
    """Add the LAION tag grid to ``CLIP_ARCHS`` (idempotent) so
    ``random:convnext_base_w`` etc. resolve through the standard zoo."""
    from .clip import CLIP_ARCHS

    for tag in _CONVNEXT_GRID:
        CLIP_ARCHS.setdefault(tag, convnext_config_for_name(tag))


def convnext_config_for_name(name: str):
    """Parse an open_clip/LAION ConvNeXt tag (or HF repo name embedding
    one, e.g. ``laion/CLIP-convnext_large_d_320.laion2B-s29B-b131K-ft``)
    to a CLIPConfig; None when the name is not a ConvNeXt tag."""
    from .clip import CLIPConfig

    low = name.lower().replace("-", "_")
    # longest-match over the grid so _320 / _d variants win over prefixes
    best = None
    for tag in _CONVNEXT_GRID:
        if tag in low and (best is None or len(tag) > len(best)):
            best = tag
    if best is None:
        if re.search(r"convnext", low):
            # unknown variant: refuse rather than guess dimensions
            raise ValueError(
                f"Unrecognized ConvNeXt variant in '{name}' — known tags: "
                f"{sorted(_CONVNEXT_GRID)}")
        return None
    (embed, res, width, depths, t_width, t_heads, t_layers,
     proj) = _CONVNEXT_GRID[best]
    return CLIPConfig(
        embed_dim=embed, image_resolution=res, vision_layers=depths,
        vision_width=width, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=t_width,
        transformer_heads=t_heads, transformer_layers=t_layers,
        act="gelu", vision_tower="convnext", vision_proj=proj)


# ---------------------------------------------------------------------------
# open_clip checkpoint conversion
# ---------------------------------------------------------------------------


def _t(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dwconv(w: np.ndarray) -> np.ndarray:
    # torch depthwise weight [C, 1, kh, kw] -> flax grouped-conv kernel
    # [kh, kw, 1, C] (in_features // groups == 1)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convnext_config_from_shapes(shapes: Mapping[str, tuple]):
    """Infer the CLIPConfig from an open_clip ConvNeXt state dict's tensor
    shapes (authoritative over the tag table — same policy as
    ``config_from_state_dict_shapes`` for the OpenAI zoo)."""
    from .clip import CLIPConfig

    width = shapes["visual.trunk.stem.0.weight"][0]
    n_stages = 1 + len({k.split(".")[3] for k in shapes
                        if re.match(r"visual\.trunk\.stages\.[1-9]", k)})
    depths = []
    for s in range(n_stages):
        blocks = {k.split(".")[5] for k in shapes
                  if k.startswith(f"visual.trunk.stages.{s}.blocks.")}
        depths.append(len(blocks))
    if "visual.head.proj.weight" in shapes:
        proj = "linear"
        embed = shapes["visual.head.proj.weight"][0]
    else:
        proj = "mlp"
        embed = shapes["visual.head.mlp.fc2.weight"][0]
    t_width = shapes["ln_final.weight"][0]
    t_layers = len({k.split(".")[2] for k in shapes
                    if k.startswith("transformer.resblocks.")})
    # resolution is NOT inferable from conv weights (no positional
    # embedding), and the open_clip grid pairs one width with several
    # resolutions (base=224, base_w=256, *_320=320).  Callers that know
    # the tag pass resolution= explicitly; here we default to 256 and the
    # top-level converter warns when nothing overrode it.
    res = 256
    return CLIPConfig(
        embed_dim=int(embed), image_resolution=res,
        vision_layers=tuple(int(d) for d in depths),
        vision_width=int(width), vision_patch_size=None, context_length=77,
        vocab_size=int(shapes["token_embedding.weight"][0]),
        transformer_width=int(t_width),
        transformer_heads=int(t_width) // 64,
        transformer_layers=int(t_layers),
        act="gelu", vision_tower="convnext", vision_proj=proj)


def openclip_convnext_state_dict_to_params(
        state_dict: Mapping[str, Any], resolution: int = 0):
    """open_clip ``CLIP-convnext_*`` torch state dict -> (CLIPConfig,
    flax params).  Vision keys follow timm's ConvNeXt naming under
    ``visual.trunk.*`` with the open_clip head under ``visual.head.*``;
    text keys are the OpenAI-style tower (open_clip's ``CLIP`` class
    shares those attribute names), delegated to the existing converter
    pieces in ``models/convert.py``."""
    from .convert import _convert_block, _set

    sd: Dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        arr = (v.detach().cpu().float().numpy() if hasattr(v, "detach")
               else np.asarray(v, dtype=np.float32))
        sd[k] = arr

    cfg = convnext_config_from_shapes({k: tuple(v.shape)
                                       for k, v in sd.items()})
    if resolution:
        import dataclasses

        cfg = dataclasses.replace(cfg, image_resolution=int(resolution))
    else:
        import warnings

        warnings.warn(
            "ConvNeXt checkpoint resolution is not inferable from weights; "
            f"defaulting to {cfg.image_resolution}px.  Pass resolution= "
            "(224 for convnext_base, 256 for _w/large_d/xxlarge, 320 for "
            "*_320 variants) to silence this and evaluate at the trained "
            "resolution.")
    params: Dict = {}
    vis = ("visual",)

    def _ln(prefix: Tuple[str, ...], leaf: str, v: np.ndarray) -> None:
        _set(params, prefix + ("scale" if leaf == "weight" else "bias",), v)

    for key, v in sd.items():
        if key == "logit_scale":
            _set(params, ("logit_scale",), v)
        elif key == "positional_embedding":
            _set(params, ("text", "positional_embedding"), v)
        elif key == "text_projection":
            _set(params, ("text", "text_projection"), v)
        elif key == "token_embedding.weight":
            _set(params, ("text", "token_embedding"), v)
        elif key.startswith("ln_final."):
            _ln(("text", "ln_final"), key.split(".")[1], v)
        elif key.startswith("transformer.resblocks."):
            parts = key.split(".")
            if not _convert_block(
                    params, ("text", "transformer", f"resblocks_{parts[2]}"),
                    ".".join(parts[3:]), v):
                raise KeyError(f"Unhandled text key: {key}")
        elif key.startswith("visual.trunk.stem."):
            idx, leaf = key.split(".")[3:5]
            if idx == "0":
                _set(params, vis + ("stem_conv",
                                    "kernel" if leaf == "weight" else "bias"),
                     _conv(v) if leaf == "weight" else v)
            else:
                _ln(vis + ("stem_norm",), leaf, v)
        elif key.startswith("visual.trunk.stages."):
            parts = key.split(".")
            s = int(parts[3])
            if parts[4] == "downsample":
                if parts[5] == "0":
                    _ln(vis + (f"down_norm_{s}",), parts[6], v)
                else:
                    _set(params, vis + (f"down_conv_{s}",
                                        "kernel" if parts[6] == "weight"
                                        else "bias"),
                         _conv(v) if parts[6] == "weight" else v)
            elif parts[4] == "blocks":
                b, mod = int(parts[5]), parts[6]
                blk = vis + (f"stage{s}_block{b}",)
                if mod == "conv_dw":
                    leaf = parts[7]
                    _set(params, blk + ("dwconv",
                                        "kernel" if leaf == "weight"
                                        else "bias"),
                         _dwconv(v) if leaf == "weight" else v)
                elif mod == "norm":
                    _ln(blk + ("norm",), parts[7], v)
                elif mod == "mlp":
                    leaf = parts[8]
                    _set(params, blk + (parts[7],
                                        "kernel" if leaf == "weight"
                                        else "bias"),
                         _t(v) if leaf == "weight" else v)
                elif mod == "gamma":
                    _set(params, blk + ("gamma",), v)
                else:
                    raise KeyError(f"Unhandled block key: {key}")
            else:
                raise KeyError(f"Unhandled stage key: {key}")
        elif key.startswith("visual.trunk.head.norm."):
            _ln(vis + ("head_norm",), key.split(".")[4], v)
        elif key.startswith("visual.head.proj."):
            leaf = key.split(".")[3]
            _set(params, vis + ("head_proj",
                                "kernel" if leaf == "weight" else "bias"),
                 _t(v) if leaf == "weight" else v)
        elif key.startswith("visual.head.mlp."):
            fc, leaf = key.split(".")[3:5]
            _set(params, vis + (f"head_{fc}",
                                "kernel" if leaf == "weight" else "bias"),
                 _t(v) if leaf == "weight" else v)
        else:
            raise KeyError(f"Unhandled checkpoint key: {key}")

    # Real open_clip ConvNeXt checkpoints export the head projection with
    # proj_bias=False (open_clip TimmModel: nn.Linear(..., bias=proj_bias)
    # and Mlp(..., bias=(True, proj_bias)); no LAION config enables it),
    # so 'visual.head.proj.bias' / 'visual.head.mlp.fc2.bias' are absent.
    # The Flax head Dense layers always carry a bias param — zero-fill the
    # missing ones (numerically identical to bias=False) so model.apply
    # sees a complete tree.  (ADVICE r2, high.)
    head = params.get("visual", {})
    for mod in ("head_proj", "head_fc2"):
        if mod in head and "bias" not in head[mod]:
            head[mod]["bias"] = np.zeros(
                head[mod]["kernel"].shape[-1], dtype=np.float32)

    return cfg, params


register_convnext_archs()
