"""Torch CLIP checkpoint -> Flax param pytree conversion.

Ingests any of the OpenAI CLIP zoo checkpoints (or an arbitrary torch CLIP
state dict) without keeping torch in the runtime path: conversion happens
once, the result is cached as ``.npz`` and loaded as numpy arrays.

Key layout facts handled here:
  * torch ``nn.Linear`` weight is [out, in]  -> flax Dense kernel [in, out]
  * torch ``nn.Conv2d`` weight is OIHW       -> flax Conv kernel HWIO
  * ``attn.in_proj_weight`` packs q/k/v rows -> one Dense of width 3W
  * BatchNorm running stats -> FrozenBatchNorm params (mean/var)
  * ``downsample.0/1`` (conv/bn)             -> ``downsample_conv/_bn``

Reference mapping source: `/root/reference/clip/model.py` module tree.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .clip import CLIPConfig, config_from_state_dict_shapes

Array = np.ndarray


def _t(w: Array) -> Array:  # linear weight -> dense kernel
    return np.ascontiguousarray(w.T)


def _conv(w: Array) -> Array:  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: Dict, path: Tuple[str, ...], value: Array) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_block(out: Dict, prefix: Tuple[str, ...], rest: str, v: Array) -> bool:
    """Convert one `transformer.resblocks.N.<rest>` tensor. Returns handled."""
    parts = rest.split(".")
    if parts[0] == "attn":
        if parts[1] == "in_proj_weight":
            _set(out, prefix + ("attn", "in_proj", "kernel"), _t(v))
        elif parts[1] == "in_proj_bias":
            _set(out, prefix + ("attn", "in_proj", "bias"), v)
        elif parts[1] == "out_proj":
            leaf = "kernel" if parts[2] == "weight" else "bias"
            _set(out, prefix + ("attn", "out_proj", leaf),
                 _t(v) if leaf == "kernel" else v)
        else:
            return False
    elif parts[0] in ("ln_1", "ln_2"):
        leaf = "scale" if parts[1] == "weight" else "bias"
        _set(out, prefix + (parts[0], leaf), v)
    elif parts[0] == "mlp":
        leaf = "kernel" if parts[2] == "weight" else "bias"
        _set(out, prefix + ("mlp", parts[1], leaf),
             _t(v) if leaf == "kernel" else v)
    else:
        return False
    return True


def _convert_bn(out: Dict, prefix: Tuple[str, ...], leaf: str, v: Array) -> bool:
    bn_map = {"weight": "scale", "bias": "bias",
              "running_mean": "mean", "running_var": "var"}
    if leaf == "num_batches_tracked":
        return True  # dropped
    if leaf not in bn_map:
        return False
    _set(out, prefix + (bn_map[leaf],), v)
    return True


def torch_state_dict_to_params(
    state_dict: Mapping[str, Any],
    resolution: int = 0,
) -> Tuple[CLIPConfig, Dict]:
    """Convert a torch CLIP state dict (tensors or ndarrays) to
    (CLIPConfig, flax params dict).  ``resolution`` only matters for
    ConvNeXt checkpoints, whose input size is not inferable from weight
    shapes (the converter warns and defaults to 256 when omitted).

    Accepts real open_clip export quirks: a DDP ``module.`` key prefix is
    stripped, and ``attn_mask`` buffers (open_clip registers the causal
    mask as a persistent buffer; it is reconstructed, not a weight) are
    dropped."""
    if state_dict and all(str(k).startswith("module.")
                          for k in state_dict):
        state_dict = {str(k)[len("module."):]: v
                      for k, v in state_dict.items()}
    state_dict = {k: v for k, v in state_dict.items()
                  if not str(k).endswith("attn_mask")}
    if any(str(k).startswith("visual.trunk.") for k in state_dict):
        # open_clip ConvNeXt-CLIP layout (timm trunk + open_clip head)
        from .convnext import openclip_convnext_state_dict_to_params

        return openclip_convnext_state_dict_to_params(
            state_dict, resolution=resolution)

    sd: Dict[str, Array] = {}
    for k, v in state_dict.items():
        if k in ("input_resolution", "context_length", "vocab_size"):
            continue
        arr = v.detach().cpu().float().numpy() if hasattr(v, "detach") else np.asarray(v, dtype=np.float32)
        sd[k] = arr

    cfg = config_from_state_dict_shapes({k: tuple(v.shape) for k, v in sd.items()})
    params: Dict = {}

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
            leaf = "scale" if key.endswith("weight") else "bias"
            _set(params, ("text", "ln_final", leaf), v)
        elif key.startswith("transformer.resblocks."):
            parts = key.split(".")
            idx, rest = parts[2], ".".join(parts[3:])
            if not _convert_block(params, ("text", "transformer", f"resblocks_{idx}"),
                                  rest, v):
                raise KeyError(f"Unhandled text transformer key: {key}")
        elif key.startswith("visual."):
            _convert_visual_key(params, cfg, key[len("visual."):], v)
        else:
            raise KeyError(f"Unhandled checkpoint key: {key}")

    return cfg, params


def _convert_visual_key(params: Dict, cfg: CLIPConfig, key: str, v: Array) -> None:
    vis = ("visual",)
    if cfg.is_vit:
        if key == "class_embedding":
            _set(params, vis + ("class_embedding",), v)
        elif key == "positional_embedding":
            _set(params, vis + ("positional_embedding",), v)
        elif key == "proj":
            _set(params, vis + ("proj",), v)
        elif key == "conv1.weight":
            _set(params, vis + ("conv1", "kernel"), _conv(v))
        elif key.startswith(("ln_pre.", "ln_post.")):
            ln, leaf = key.split(".")
            _set(params, vis + (ln, "scale" if leaf == "weight" else "bias"), v)
        elif key.startswith("transformer.resblocks."):
            parts = key.split(".")
            idx, rest = parts[2], ".".join(parts[3:])
            if not _convert_block(params, vis + ("transformer", f"resblocks_{idx}"),
                                  rest, v):
                raise KeyError(f"Unhandled visual transformer key: visual.{key}")
        else:
            raise KeyError(f"Unhandled ViT visual key: visual.{key}")
        return

    # ModifiedResNet
    parts = key.split(".")
    if parts[0] in ("conv1", "conv2", "conv3"):
        _set(params, vis + (parts[0], "kernel"), _conv(v))
    elif parts[0] in ("bn1", "bn2", "bn3"):
        if not _convert_bn(params, vis + (parts[0],), parts[1], v):
            raise KeyError(f"Unhandled stem bn key: visual.{key}")
    elif parts[0].startswith("layer"):
        stage = parts[0][len("layer"):]
        block = parts[1]
        mod = parts[2]
        blk_prefix = vis + (f"layer{stage}_{block}",)
        if mod.startswith("conv"):
            _set(params, blk_prefix + (mod, "kernel"), _conv(v))
        elif mod.startswith("bn"):
            if not _convert_bn(params, blk_prefix + (mod,), parts[3], v):
                raise KeyError(f"Unhandled block bn key: visual.{key}")
        elif mod == "downsample":
            sub, leaf = parts[3], parts[4] if len(parts) > 4 else None
            if sub == "0":  # conv
                _set(params, blk_prefix + ("downsample_conv", "kernel"), _conv(v))
            elif sub == "1":  # bn
                if not _convert_bn(params, blk_prefix + ("downsample_bn",), leaf or parts[4], v):
                    raise KeyError(f"Unhandled downsample bn key: visual.{key}")
            else:
                raise KeyError(f"Unhandled downsample key: visual.{key}")
        else:
            raise KeyError(f"Unhandled block key: visual.{key}")
    elif parts[0] == "attnpool":
        sub = parts[1]
        if sub == "positional_embedding":
            _set(params, vis + ("attnpool", "positional_embedding"), v)
        elif sub in ("q_proj", "k_proj", "v_proj", "c_proj"):
            leaf = "kernel" if parts[2] == "weight" else "bias"
            _set(params, vis + ("attnpool", sub, leaf),
                 _t(v) if leaf == "kernel" else v)
        else:
            raise KeyError(f"Unhandled attnpool key: visual.{key}")
    else:
        raise KeyError(f"Unhandled ResNet visual key: visual.{key}")


def save_params_npz(path, params: Dict) -> None:
    """Flatten a param pytree into an .npz (keys joined with '/')."""
    flat: Dict[str, Array] = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (k,))
        else:
            flat["/".join(prefix)] = np.asarray(node)

    walk(params, ())
    np.savez(path, **flat)


def load_params_npz(path) -> Dict:
    out: Dict = {}
    with np.load(path) as data:
        for key in data.files:
            _set(out, tuple(key.split("/")), data[key])
    return out


def cast_params(params, dtype):
    """Cast floating-point leaves of a param pytree to ``dtype``."""
    import jax

    def cast(x):
        if hasattr(x, "dtype") and np.issubdtype(np.asarray(x).dtype, np.floating):
            return np.asarray(x, dtype=dtype) if isinstance(x, np.ndarray) else x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, params)
