"""Legacy loader paths: K-fold cross-validation and simple train/valid
splits over the bulk-loaded arrays.

Capability parity with the reference's aihab-legacy loader factories
(`/root/reference/data/dataloader.py:80-325`, `data/dataset.py:202-232`):

  * ``data_partition``        — bulk load + grouped K-fold or stratified
                                split index lists;
  * ``cross_valid_loaders``   — list of (train, valid) SplitView pairs,
                                one per fold (CrossValidDataloaders);
  * ``train_valid_loaders``   — single stratified split pair
                                (get_dataloaders / efficiently_get_dataloaders);
  * legacy "ratio" crop rule  — crop = 0.875 * resize.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
from sklearn.model_selection import StratifiedGroupKFold, train_test_split

from .bulk_load import ImageArrayDataset, load_folders
from .pipeline import SplitView


def legacy_crop_size(preproc: dict) -> int:
    """The aihab 'ratio' rule: crop = 0.875 * resize."""
    crop = preproc.get("augmentations", {}).get("crop", 384)
    if crop == "ratio":
        return int(preproc["resize"] * 0.875)
    if isinstance(crop, int):
        return crop
    raise ValueError(
        "Invalid value for 'crop_size'. It must be an integer or the string "
        "'ratio'.")


def data_partition(args: dict) -> Tuple[ImageArrayDataset, List[np.ndarray],
                                        List[np.ndarray]]:
    """Bulk load + split index lists (grouped K-fold or stratified)."""
    ds = load_folders(args["dataset_paths"], args["index_file_names"],
                      args["preprocessing"].get("resize", 256))
    split = args.get("data_split", {})

    train_idx_list, valid_idx_list = [], []
    if split.get("if_grouped", False):
        n_splits = max(2, int(split.get("num_fold", 2)))
        sgk = StratifiedGroupKFold(n_splits=n_splits, shuffle=True,
                                   random_state=split.get("split_seed", 0))
        groups = np.asarray([str(p) for p in ds.plot_idx])
        for tr, va in sgk.split(ds.images, ds.labels, groups=groups):
            train_idx_list.append(tr)
            valid_idx_list.append(va)
            if split.get("first_cv_only", True):
                break
    else:
        tr, va = train_test_split(
            np.arange(len(ds)), test_size=split["valid_split"],
            stratify=ds.labels, random_state=split.get("split_seed", 0))
        train_idx_list.append(tr)
        valid_idx_list.append(va)
    return ds, train_idx_list, valid_idx_list


def cross_valid_loaders(args: dict) -> List[Tuple[SplitView, SplitView]]:
    """All K folds as (train, valid) SplitView pairs."""
    split = dict(args.get("data_split", {}))
    split["if_grouped"] = True
    split["first_cv_only"] = False
    args = {**args, "data_split": split}
    ds, train_list, valid_list = data_partition(args)

    batch_size = int(args.get("batch_size", 16))
    shuffle = bool(args.get("shuffle", True))
    use_l2 = bool(args.get("use_l2_label", False))
    pairs = []
    for tr, va in zip(train_list, valid_list):
        pairs.append((
            SplitView(ds, tr, batch_size, shuffle=shuffle, use_l2_label=use_l2),
            SplitView(ds, va, batch_size, shuffle=False, use_l2_label=use_l2),
        ))
    return pairs


def train_valid_loaders(args: dict) -> Tuple[SplitView, SplitView]:
    """Single stratified (non-grouped) train/valid pair."""
    split = dict(args.get("data_split", {}))
    split["if_grouped"] = False
    args = {**args, "data_split": split}
    ds, train_list, valid_list = data_partition(args)
    batch_size = int(args.get("batch_size", 16))
    use_l2 = bool(args.get("use_l2_label", False))
    return (
        SplitView(ds, train_list[0], batch_size,
                  shuffle=bool(args.get("shuffle", True)), use_l2_label=use_l2),
        SplitView(ds, valid_list[0], batch_size, shuffle=False,
                  use_l2_label=use_l2),
    )
