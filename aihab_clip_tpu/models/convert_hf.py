"""HuggingFace ``SiglipModel`` checkpoint -> Flax SigLIP param conversion.

Maps the transformers naming scheme onto our tower layout
(``models/siglip.py``); the MAP-head attention is packed
``nn.MultiheadAttention`` weights in HF and is split into q/k/v here.
Used with a *local* HF snapshot (zero-egress environments never download).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from .siglip import SigLIPConfig

Array = np.ndarray


def _t(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def _conv(w: Array) -> Array:  # OIHW -> HWIO
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: Dict, path: Tuple[str, ...], value: Array) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def siglip_config_from_hf(hf_config) -> SigLIPConfig:
    v, t = hf_config.vision_config, hf_config.text_config
    return SigLIPConfig(
        embed_dim=int(v.hidden_size),
        image_resolution=int(v.image_size),
        patch_size=int(v.patch_size),
        vision_width=int(v.hidden_size),
        vision_layers=int(v.num_hidden_layers),
        vision_heads=int(v.num_attention_heads),
        vision_mlp_dim=int(v.intermediate_size),
        context_length=int(getattr(t, "max_position_embeddings", 64)),
        vocab_size=int(t.vocab_size),
        text_width=int(t.hidden_size),
        text_layers=int(t.num_hidden_layers),
        text_heads=int(t.num_attention_heads),
        text_mlp_dim=int(t.intermediate_size),
    )


_LN_MAP = {"layer_norm1": "ln_1", "layer_norm2": "ln_2"}
_MLP_MAP = {"fc1": "c_fc", "fc2": "c_proj"}


def _convert_encoder_layer(out: Dict, prefix: Tuple[str, ...], rest: str,
                           v: Array) -> bool:
    parts = rest.split(".")
    if parts[0] == "self_attn":
        proj, leaf = parts[1], parts[2]
        leaf = "kernel" if leaf == "weight" else "bias"
        _set(out, prefix + ("attn", proj, leaf),
             _t(v) if leaf == "kernel" else v)
    elif parts[0] in _LN_MAP:
        leaf = "scale" if parts[1] == "weight" else "bias"
        _set(out, prefix + (_LN_MAP[parts[0]], leaf), v)
    elif parts[0] == "mlp":
        leaf = "kernel" if parts[2] == "weight" else "bias"
        _set(out, prefix + ("mlp", _MLP_MAP[parts[1]], leaf),
             _t(v) if leaf == "kernel" else v)
    else:
        return False
    return True


def hf_siglip_state_dict_to_params(
    state_dict: Mapping[str, Any],
    width_vision: int,
) -> Dict:
    """Convert a torch SiglipModel state dict to our flax param tree."""
    sd: Dict[str, Array] = {}
    for k, v in state_dict.items():
        arr = (v.detach().cpu().float().numpy() if hasattr(v, "detach")
               else np.asarray(v, np.float32))
        sd[k] = arr

    params: Dict = {}
    for key, v in sd.items():
        if key.startswith("vision_model."):
            _convert_vision_key(params, key[len("vision_model."):], v,
                                width_vision)
        elif key.startswith("text_model."):
            _convert_text_key(params, key[len("text_model."):], v)
        elif key == "logit_scale":
            _set(params, ("logit_scale",), v.reshape(()))
        elif key == "logit_bias":
            _set(params, ("logit_bias",), v.reshape(()))
        elif "position_ids" in key:
            continue
        else:
            raise KeyError(f"Unhandled HF key: {key}")
    return params


def _convert_vision_key(params: Dict, key: str, v: Array, width: int) -> None:
    vis = ("visual",)
    parts = key.split(".")
    if key.startswith("embeddings.patch_embedding."):
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        _set(params, vis + ("conv1", leaf),
             _conv(v) if leaf == "kernel" else v)
    elif key == "embeddings.position_embedding.weight":
        _set(params, vis + ("positional_embedding",), v)
    elif "position_ids" in key:
        pass
    elif key.startswith("encoder.layers."):
        idx, rest = parts[2], ".".join(parts[3:])
        if not _convert_encoder_layer(
                params, vis + ("transformer", f"resblocks_{idx}"), rest, v):
            raise KeyError(f"Unhandled vision layer key: {key}")
    elif key.startswith("post_layernorm."):
        leaf = "scale" if parts[-1] == "weight" else "bias"
        _set(params, vis + ("ln_post", leaf), v)
    elif key == "head.probe":
        _set(params, vis + ("attnpool", "probe"), v)
    elif key.startswith("head.attention."):
        sub = ".".join(parts[2:])
        if sub == "in_proj_weight":
            q, k, vv = np.split(v, 3, axis=0)
            for name, w in (("q_proj", q), ("k_proj", k), ("v_proj", vv)):
                _set(params, vis + ("attnpool", "attn", name, "kernel"), _t(w))
        elif sub == "in_proj_bias":
            q, k, vv = np.split(v, 3, axis=0)
            for name, b in (("q_proj", q), ("k_proj", k), ("v_proj", vv)):
                _set(params, vis + ("attnpool", "attn", name, "bias"), b)
        elif sub == "out_proj.weight":
            _set(params, vis + ("attnpool", "attn", "out_proj", "kernel"), _t(v))
        elif sub == "out_proj.bias":
            _set(params, vis + ("attnpool", "attn", "out_proj", "bias"), v)
        else:
            raise KeyError(f"Unhandled MAP-head key: {key}")
    elif key.startswith("head.layernorm."):
        leaf = "scale" if parts[-1] == "weight" else "bias"
        _set(params, vis + ("attnpool", "ln", leaf), v)
    elif key.startswith("head.mlp."):
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        _set(params, vis + ("attnpool", "mlp", _MLP_MAP[parts[2]], leaf),
             _t(v) if leaf == "kernel" else v)
    else:
        raise KeyError(f"Unhandled vision key: {key}")


def _convert_text_key(params: Dict, key: str, v: Array) -> None:
    txt = ("text",)
    parts = key.split(".")
    if key == "embeddings.token_embedding.weight":
        _set(params, txt + ("token_embedding",), v)
    elif key == "embeddings.position_embedding.weight":
        _set(params, txt + ("positional_embedding",), v)
    elif "position_ids" in key:
        pass
    elif key.startswith("encoder.layers."):
        idx, rest = parts[2], ".".join(parts[3:])
        if not _convert_encoder_layer(
                params, txt + ("transformer", f"resblocks_{idx}"), rest, v):
            raise KeyError(f"Unhandled text layer key: {key}")
    elif key.startswith("final_layer_norm."):
        leaf = "scale" if parts[-1] == "weight" else "bias"
        _set(params, txt + ("ln_final", leaf), v)
    elif key.startswith("head."):
        leaf = "kernel" if parts[-1] == "weight" else "bias"
        _set(params, txt + ("head", leaf), _t(v) if leaf == "kernel" else v)
    else:
        raise KeyError(f"Unhandled text key: {key}")


def find_local_hf_snapshot(repo_id: str) -> Optional[Path]:
    """Locate a locally cached HF snapshot dir (no network)."""
    cache = Path(os.path.expanduser(
        os.environ.get("HF_HOME", "~/.cache/huggingface"))) / "hub"
    repo_dir = cache / f"models--{repo_id.replace('/', '--')}" / "snapshots"
    if not repo_dir.is_dir():
        return None
    snaps = sorted(repo_dir.iterdir(), key=lambda p: p.stat().st_mtime)
    for snap in reversed(snaps):
        if any(snap.glob("*.safetensors")) or any(snap.glob("*.bin")):
            return snap
    return None


def load_local_hf_siglip(repo_id: str):
    """Load + convert a locally cached HF Siglip checkpoint.

    Returns (SigLIPConfig, params) or raises FileNotFoundError."""
    snap = find_local_hf_snapshot(repo_id)
    if snap is None:
        raise FileNotFoundError(
            f"No local HF snapshot for '{repo_id}' "
            f"(zero-egress: place one under ~/.cache/huggingface/hub)")
    import transformers

    model = transformers.SiglipModel.from_pretrained(str(snap))
    cfg = siglip_config_from_hf(model.config)
    params = hf_siglip_state_dict_to_params(model.state_dict(),
                                            cfg.vision_width)
    return cfg, params
