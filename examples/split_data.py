#!/usr/bin/env python
"""Example: reproduce the stratified-group validation split.

Runnable counterpart of the reference's `notebooks/split_data.ipynb`:
bulk-loads a CS-format dataset, performs the grouped stratified split
(photos of one survey plot never straddle train/val), and reports class
balance per side.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from aihab_clip_tpu.utils import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()

import numpy as np

from aihab_clip_tpu.data import (
    load_folders,
    make_synthetic_cs_dataset,
    stratified_group_split,
)
from aihab_clip_tpu.taxonomy import REASSIGN_LABEL_NAME_L3


def main():
    data_dir = Path("./data/synth_cs_train")
    if not data_dir.is_dir():
        print("generating synthetic dataset ...")
        make_synthetic_cs_dataset("./data", name="synth_cs",
                                  n_train_per_class=8)

    ds = load_folders([str(data_dir)], ["index.csv"], resize_dim=32)
    print(f"loaded {len(ds)} images, {len(set(map(str, ds.plot_idx)))} plots, "
          f"{len(np.unique(ds.labels))} classes")

    groups = np.asarray([str(p) for p in ds.plot_idx])
    train_idx, val_idx = stratified_group_split(ds.labels, groups,
                                                val_ratio=0.2, seed=42)
    print(f"train {len(train_idx)} / val {len(val_idx)}")
    assert set(groups[train_idx]).isdisjoint(groups[val_idx]), \
        "grouped split must keep plots together"

    print("\nper-class counts (train / val):")
    for c in np.unique(ds.labels):
        name = REASSIGN_LABEL_NAME_L3[int(c)]
        n_tr = int((ds.labels[train_idx] == c).sum())
        n_va = int((ds.labels[val_idx] == c).sum())
        print(f"  {name:40s} {n_tr:4d} / {n_va:3d}")


if __name__ == "__main__":
    main()
