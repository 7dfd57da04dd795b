"""Prompt-ensemble text classifier head.

Builds the zero-shot classifier weights from a prompt ensemble, matching the
reference's two equivalent builders:
  * ``clip_classifier`` (`/root/reference/utils.py:31-57`): encode each
    class's template prompts, L2-normalize, mean over templates,
    re-normalize, stack -> [dim, n_classes]; also keeps pre-projection text
    features.
  * ``_compute_text_weights_from_tokens``
    (`/root/reference/methods/PEFT_openclip.py:17-47`): same math as a pure
    function of (params, flattened tokens) — used inside the jitted PEFT
    train step when the text tower is trainable.

The core is a single jittable function; the offline builder just wraps it
with tokenization and batching.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..tokenizer import tokenize
from .clip import CLIPModel


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def compute_text_weights(
    model: CLIPModel,
    params,
    tokens: jax.Array,
    num_classes: int,
    num_templates: int,
    scan_blocks: bool = False,
) -> jax.Array:
    """Jittable: [C*T, ctx] tokens -> [dim, C] ensemble classifier weights.

    ``scan_blocks`` (SigLIP towers) runs the text blocks under ``lax.scan``
    — identical math, one block body in the compiled program (see
    ``fast_siglip.canonical_blocks_scan``)."""
    expected = num_classes * num_templates
    if tokens.shape[0] != expected:
        raise ValueError(
            f"Prompt token count mismatch: got {tokens.shape[0]}, expected "
            f"{expected} (= num_classes {num_classes} * num_templates {num_templates}).")
    from ..models.siglip import SigLIPConfig

    if scan_blocks and isinstance(model.config, SigLIPConfig):
        from .fast_siglip import siglip_text_scan

        _, feats = siglip_text_scan(params, tokens, model.config,
                                    dtype=model.dtype)
    else:
        _, feats = model.apply({"params": params}, tokens,
                               method=CLIPModel.encode_text)
    feats = l2_normalize(feats.astype(jnp.float32))
    feats = feats.reshape(num_classes, num_templates, -1).mean(axis=1)
    feats = l2_normalize(feats)
    return feats.T  # [dim, C]


def build_text_head(
    model: CLIPModel,
    params,
    prompts: Sequence[str],
    num_classes: int,
    num_templates: int,
    batch_size: int = 256,
    context_length: Optional[int] = None,
    tokenize_fn=None,
) -> Dict[str, Any]:
    """Offline text-head build: tokenize + batched encode.

    ``tokenize_fn(texts, context_length) -> [N, ctx] int32`` overrides the
    default CLIP BPE (e.g. a SigLIP sentencepiece tokenizer from a local
    HF snapshot).  Returns {'text_weights' [dim, C] f32,
    'text_weights_before' [C, T, pre] f32, 'prompt_tokens' [C*T, ctx]
    int32, 'num_templates'}."""
    ctx = context_length or model.config.context_length
    tok = tokenize_fn or (lambda texts, context_length: tokenize(
        texts, context_length=context_length, truncate=True))
    tokens = np.asarray(tok(list(prompts), ctx), dtype=np.int32)

    pre_list, post_list = [], []
    encode = jax.jit(lambda p, t: model.apply({"params": p}, t,
                                              method=CLIPModel.encode_text))
    n = tokens.shape[0]
    for start in range(0, n, batch_size):
        chunk = tokens[start:start + batch_size]
        pad = 0
        if chunk.shape[0] < batch_size and n > batch_size:
            pad = batch_size - chunk.shape[0]
            chunk = np.concatenate(
                [chunk, np.zeros((pad, ctx), chunk.dtype)], 0)
        pre, post = encode(params, jnp.asarray(chunk))
        pre, post = np.asarray(pre, np.float32), np.asarray(post, np.float32)
        if pad:
            pre, post = pre[:-pad], post[:-pad]
        pre_list.append(pre)
        post_list.append(post)

    pre = np.concatenate(pre_list, 0)   # [C*T, pre_dim]
    post = np.concatenate(post_list, 0)

    post = post / np.linalg.norm(post, axis=-1, keepdims=True)
    post = post.reshape(num_classes, num_templates, -1).mean(axis=1)
    post = post / np.linalg.norm(post, axis=-1, keepdims=True)

    return {
        "text_weights": jnp.asarray(post.T),                 # [dim, C]
        "text_weights_before": jnp.asarray(
            pre.reshape(num_classes, num_templates, -1)),    # [C, T, pre]
        "prompt_tokens": jnp.asarray(tokens),
        "num_templates": num_templates,
    }


def classifier_logits(image_features: jax.Array,
                      text_weights: jax.Array,
                      scale: float = 100.0) -> jax.Array:
    """logits = scale * normalize(img) @ text_weights  (logit_scale is
    intentionally ignored — reference `/root/reference/methods/PEFT_openclip.py:262`)."""
    feats = l2_normalize(image_features.astype(jnp.float32))
    return scale * feats @ text_weights
