"""Host -> device batching pipeline.

Batches are fixed-shape (static for XLA): the trailing partial batch is
padded and carries a validity mask that the loss/metric code honors, so
every step hits the same compiled executable.  Shuffling is host-side
(np.random, seeded per epoch); augmentation randomness is device-side
(jax.random keys folded per epoch/batch) — reproducing the reference's
"selection once per seed, variation via views" model with explicit keys.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, List

import numpy as np

from .bulk_load import ImageArrayDataset


@dataclasses.dataclass
class Batch:
    images: np.ndarray         # [B, R, R, 3] uint8 (padded)
    labels: np.ndarray         # [B] int32 (padded with 0)
    valid: np.ndarray          # [B] bool
    indices: np.ndarray        # [B] int64 absolute dataset indices (-1 pad)

    @property
    def n_valid(self) -> int:
        return int(self.valid.sum())


class SplitView:
    """A view over an ImageArrayDataset restricted to selected indices,
    yielding fixed-shape padded batches."""

    def __init__(self, dataset: ImageArrayDataset, indices: np.ndarray,
                 batch_size: int, shuffle: bool = False,
                 use_l2_label: bool = False, seed: int = 0,
                 drop_remainder: bool = False):
        self.dataset = dataset
        self.indices = np.asarray(indices, dtype=np.int64)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.use_l2_label = use_l2_label
        self.seed = int(seed)
        self.drop_remainder = drop_remainder

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self) -> int:
        return len(self.indices)

    @property
    def labels(self) -> np.ndarray:
        src = self.dataset.l2_labels if self.use_l2_label else self.dataset.labels
        return src[self.indices]

    def batches(self, epoch: int = 0) -> Iterator[Batch]:
        order = self.indices
        if self.shuffle:
            rng = np.random.RandomState((self.seed * 100003 + epoch) % (2 ** 31))
            order = order[rng.permutation(len(order))]

        labels_src = (self.dataset.l2_labels if self.use_l2_label
                      else self.dataset.labels)
        bs = self.batch_size
        n = len(order)
        stop = (n // bs) * bs if self.drop_remainder else n
        for start in range(0, stop, bs):
            idx = order[start:start + bs]
            k = len(idx)
            if k < bs:  # pad trailing batch to the static shape
                pad = np.zeros(bs - k, dtype=np.int64)
                images = np.concatenate(
                    [self.dataset.images[idx],
                     np.zeros((bs - k,) + self.dataset.images.shape[1:],
                              self.dataset.images.dtype)], 0)
                labels = np.concatenate([labels_src[idx], pad], 0)
                valid = np.concatenate([np.ones(k, bool), np.zeros(bs - k, bool)])
                indices = np.concatenate([idx, np.full(bs - k, -1, np.int64)])
            else:
                images = self.dataset.images[idx]
                labels = labels_src[idx]
                valid = np.ones(bs, bool)
                indices = idx
            yield Batch(images=np.ascontiguousarray(images),
                        labels=labels.astype(np.int32),
                        valid=valid, indices=indices)

    def metadata_rows(self, indices: np.ndarray) -> List[dict]:
        return [self.dataset.metadata_row(int(i)) for i in indices if i >= 0]
