"""Tip-Adapter-style cache model + misc few-shot helpers.

Capability parity with the reference's legacy method utilities
(`/root/reference/methods/utils.py:23-138`, `/root/reference/utils.py:19-29,
60-82`): a training-free cache model over few-shot image features, the
(beta, alpha) hyper-parameter grid search, class centroids, confidence
intervals, and a simple post-projection feature cache for probes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def one_hot(labels: jax.Array, num_classes: int,
            dtype=jnp.float32) -> jax.Array:
    return jax.nn.one_hot(labels, num_classes, dtype=dtype)


def compute_centroids(features: jax.Array, labels: jax.Array,
                      num_classes: int) -> jax.Array:
    """Per-class feature sums ([C, D]); a one-hot matmul (MXU-friendly)."""
    oh = one_hot(labels, num_classes, dtype=features.dtype)  # [N, C]
    return oh.T @ features


def compute_mean_centroids(features: jax.Array, labels: jax.Array,
                           num_classes: int) -> jax.Array:
    oh = one_hot(labels, num_classes, dtype=features.dtype)
    sums = oh.T @ features
    counts = jnp.maximum(jnp.sum(oh, axis=0)[:, None], 1.0)
    return sums / counts


def build_cache_model(
    encode_views: Callable[[int], Tuple[np.ndarray, np.ndarray]],
    augment_epochs: int,
    num_classes: int,
) -> Tuple[jax.Array, jax.Array]:
    """Build the Tip-Adapter cache: keys = mean over augmentation views of
    normalized train features [D, N]; values = one-hot labels [N, C]."""
    feats_sum = None
    labels0 = None
    for v in range(augment_epochs):
        feats, labels = encode_views(v)
        feats = np.asarray(feats, np.float32)
        feats /= np.maximum(np.linalg.norm(feats, axis=-1, keepdims=True),
                            1e-12)
        feats_sum = feats if feats_sum is None else feats_sum + feats
        if v == 0:
            labels0 = np.asarray(labels)
    keys = feats_sum / augment_epochs
    keys /= np.maximum(np.linalg.norm(keys, axis=-1, keepdims=True), 1e-12)
    values = np.asarray(jax.nn.one_hot(labels0, num_classes))
    return jnp.asarray(keys.T), jnp.asarray(values)  # [D, N], [N, C]


def tip_logits(features: jax.Array, cache_keys: jax.Array,
               cache_values: jax.Array, clip_weights: jax.Array,
               beta: float, alpha: float) -> jax.Array:
    """Tip-Adapter logits: CLIP zero-shot + cache-affinity term."""
    affinity = features @ cache_keys                      # [B, N]
    cache_logits = jnp.exp(-beta + beta * affinity) @ cache_values
    clip_logits = 100.0 * features @ clip_weights
    return clip_logits + alpha * cache_logits


def search_hp_tip(
    features: jax.Array,
    labels: jax.Array,
    cache_keys: jax.Array,
    cache_values: jax.Array,
    clip_weights: jax.Array,
    search_scale: Tuple[float, float] = (7.0, 3.0),
    search_step: Tuple[int, int] = (200, 20),
    verbose: bool = False,
) -> Tuple[float, float, float]:
    """(beta, alpha) grid search maximizing top-1 accuracy.  The whole grid
    is evaluated with precomputed affinity/clip logits — one matmul each,
    not one forward per combination."""
    beta_list = [i * (search_scale[0] - 0.1) / search_step[0] + 0.1
                 for i in range(search_step[0])]
    alpha_list = [i * (search_scale[1] - 0.1) / search_step[1] + 0.1
                  for i in range(search_step[1])]

    affinity = features @ cache_keys
    clip_logits = 100.0 * features @ clip_weights
    labels = jnp.asarray(labels)

    best = (0.0, 0.0, 0.0)
    for beta in beta_list:
        cache_logits = jnp.exp(-beta + beta * affinity) @ cache_values
        for alpha in alpha_list:
            logits = clip_logits + alpha * cache_logits
            acc = float(jnp.mean(jnp.argmax(logits, -1) == labels) * 100.0)
            if acc > best[0]:
                if verbose:
                    print(f"New best setting, beta: {beta:.2f}, "
                          f"alpha: {alpha:.2f}; accuracy: {acc:.2f}")
                best = (acc, beta, alpha)
    if verbose:
        print(f"\nAfter searching, the best accuracy: {best[0]:.2f}.\n")
    return best[1], best[2], best[0]


def compute_confidence_interval(data, axis: int = 0) -> Tuple[float, float]:
    """95% CI of sampled accuracies (reference `/root/reference/utils.py:19-29`)."""
    a = 1.0 * np.asarray(data)
    m = np.mean(a, axis=axis)
    std = np.std(a, axis=axis)
    pm = 1.96 * (std / np.sqrt(a.shape[axis]))
    return m, pm


def pre_load_features(cache_dir: Path, split: str,
                      encode_split: Optional[Callable] = None,
                      load_cached: bool = True):
    """Post-projection feature cache for probes (reference
    ``pre_load_features``): encode once, reuse from npy thereafter."""
    cache_dir = Path(cache_dir)
    fpath = cache_dir / f"{split}_f.npy"
    lpath = cache_dir / f"{split}_l.npy"
    if load_cached and fpath.is_file() and lpath.is_file():
        return np.load(fpath), np.load(lpath)
    if encode_split is None:
        raise FileNotFoundError(f"No cached features at {fpath}")
    feats, labels = encode_split()
    cache_dir.mkdir(parents=True, exist_ok=True)
    np.save(fpath, np.asarray(feats))
    np.save(lpath, np.asarray(labels))
    return np.asarray(feats), np.asarray(labels)
