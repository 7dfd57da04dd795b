"""LoRA: low-rank adapter fine-tuning (beyond-reference PEFT method).

The reference's only PEFT method is partial unfreeze
(`/root/reference/methods/PEFT_openclip.py` — lock_image_tower /
lock_text_tower); LoRA is the adapter-style counterpart this framework
adds: every target kernel ``W [in, out]`` gets a trainable pair
``A [in, r]``, ``B [r, out]`` (A ~ N(0, 1/r), B = 0 — the delta starts at
zero) and trains ``W_eff = W + (alpha / r) * A @ B`` with the base tower
completely frozen.

TPU-first shape: the adapters are *merged in-jit* each step — one
[in, r] @ [r, out] GEMM + add per target (negligible next to the tower:
r<=32 vs widths >=768) — so the forward is the CANONICAL tower on
``W_eff`` and every existing encode path (module, scan_blocks, eval,
serving-after-merge) works unchanged.  Gradients flow
loss -> W_eff -> (A, B); the frozen base never enters the optimizer.

Targets: the attention projections and (optionally) the MLP kernels of
every transformer block, vision and/or text tower — the standard LoRA
placement.  Works for both param layouts: CLIP towers (packed
``attn/in_proj`` + ``attn/out_proj``) and SigLIP towers (separate
``q_proj``/``k_proj``/``v_proj``/``out_proj``).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

# kernel leaf names targeted inside a transformer block
ATTN_KERNELS = ("in_proj", "out_proj", "q_proj", "k_proj", "v_proj")
MLP_KERNELS = ("c_fc", "c_proj")


def lora_target_paths(params: Dict, *, towers: Tuple[str, ...] = ("visual",),
                      include_mlp: bool = False) -> List[Tuple[str, ...]]:
    """Flat paths of every target kernel: 2-D ``kernel`` leaves under
    ``<tower>/transformer/resblocks_i/{attn,mlp}/...``."""
    flat = traverse_util.flatten_dict(params)
    out = []
    for path, leaf in flat.items():
        if len(path) < 4 or path[0] not in towers or path[-1] != "kernel":
            continue
        if path[1] != "transformer" or getattr(leaf, "ndim", 0) != 2:
            continue
        mod = path[-2]
        if mod in ATTN_KERNELS or (include_mlp and mod in MLP_KERNELS):
            out.append(path)
    return sorted(out)


def lora_init(params: Dict, rank: int, key: jax.Array, *,
              towers: Tuple[str, ...] = ("visual",),
              include_mlp: bool = False) -> Dict:
    """Adapter tree {joined_path: {"a": [in, r], "b": [r, out]}} for every
    target kernel.  A ~ N(0, 1/r) f32, B = 0 (delta starts at zero, so
    step 0 reproduces the base model exactly)."""
    adapters = {}
    flat = traverse_util.flatten_dict(params)
    for path in lora_target_paths(params, towers=towers,
                                  include_mlp=include_mlp):
        w = flat[path]
        key, sub = jax.random.split(key)
        a = (jax.random.normal(sub, (w.shape[0], rank), jnp.float32)
             * (1.0 / rank))
        b = jnp.zeros((rank, w.shape[1]), jnp.float32)
        adapters["/".join(path)] = {"a": a, "b": b}
    if not adapters:
        raise ValueError(
            f"no LoRA target kernels found under towers={towers} "
            "(expected <tower>/transformer/resblocks_i/... 2-D kernels)")
    return adapters


def lora_merge(params: Dict, adapters: Dict, alpha: float) -> Dict:
    """W_eff = W + (alpha / r) * A @ B on every adapted leaf (jit-safe;
    differentiable w.r.t. the adapters)."""
    flat = dict(traverse_util.flatten_dict(params))
    for joined, ab in adapters.items():
        path = tuple(joined.split("/"))
        w = flat[path]
        rank = ab["a"].shape[1]
        delta = (ab["a"] @ ab["b"]) * (alpha / rank)
        flat[path] = (w.astype(jnp.float32) + delta).astype(w.dtype)
    return traverse_util.unflatten_dict(flat)


def lora_param_count(adapters: Dict) -> int:
    return sum(int(ab["a"].size + ab["b"].size) for ab in adapters.values())
