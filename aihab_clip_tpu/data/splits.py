"""Dataset partitioning: stratified-group validation split and seeded
few-shot selection.

Same contracts as the reference (`/root/reference/data/dataloader.py:327-361`):
  * validation split keeps all photos of a survey plot together
    (group = plot id) while approximately preserving the class balance —
    StratifiedGroupKFold with n_splits = max(2, round(1/val_ratio)), first
    fold taken as the split;
  * few-shot selection samples ``shots`` per class with the same
    np.random.RandomState call pattern (without replacement when the class
    is large enough, with replacement otherwise) so selections reproduce
    at matched seed.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from sklearn.model_selection import StratifiedGroupKFold, train_test_split


def stratified_group_split(
    labels: np.ndarray,
    groups: np.ndarray,
    val_ratio: float,
    seed: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Return (train_idx, val_idx)."""
    labels = np.asarray(labels)
    groups = np.asarray(groups)
    if val_ratio <= 0:
        return np.arange(len(labels), dtype=np.int64), np.array([], dtype=np.int64)
    n_splits = max(2, int(round(1.0 / val_ratio)))
    sgkf = StratifiedGroupKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    train_idx, val_idx = next(sgkf.split(labels, labels, groups=groups))
    return train_idx.astype(np.int64), val_idx.astype(np.int64)


def stratified_split(
    labels: np.ndarray,
    val_ratio: float,
    seed: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Plain stratified split (legacy path, no grouping)."""
    labels = np.asarray(labels)
    if val_ratio <= 0:
        return np.arange(len(labels), dtype=np.int64), np.array([], dtype=np.int64)
    train_idx, val_idx = train_test_split(
        np.arange(len(labels)), test_size=val_ratio, stratify=labels,
        random_state=seed)
    return train_idx.astype(np.int64), val_idx.astype(np.int64)


def few_shot_indices(labels: np.ndarray, shots: int,
                     rng: np.random.RandomState) -> np.ndarray:
    """Sample ``shots`` indices per class (with replacement only when a
    class has fewer than ``shots`` samples)."""
    labels = np.asarray(labels)
    sel = []
    for c in np.unique(labels):
        idx_c = np.where(labels == c)[0]
        replace = len(idx_c) < shots
        sel.extend(rng.choice(idx_c, size=shots, replace=replace).tolist())
    return np.asarray(sel, dtype=np.int64)


def selection_by_class(sel: np.ndarray, labels: np.ndarray) -> Dict[int, list]:
    """Map class id -> selected absolute indices (for inspection output)."""
    out: Dict[int, list] = {}
    for c in np.unique(labels):
        idx_c = sel[labels[sel] == c]
        out[int(c)] = idx_c.tolist()
    return out
