"""Synthetic CS-format dataset generator (test fixture / demo).

Writes a directory tree in the exact on-disk format the real Countryside
Survey data uses (image folder + index CSV with file/BH_PLOT_DESC/
BH_POLYDESC/ID columns, `_train`/`_test` folder naming) so the full data
pipeline — CSV index, bulk load, boundary fallback, grouped splits —
runs end-to-end on CPU.  Each class gets a distinct mean color so tiny
models can separate them.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ..taxonomy import BOUNDARY_PLOT_LABEL, CS_CLASSNAMES


def make_synthetic_cs_dataset(
    root: str | Path,
    name: str = "synth_cs",
    classes: Optional[Sequence[str]] = None,
    n_train_per_class: int = 6,
    n_test_per_class: int = 3,
    image_size: int = 64,
    seed: int = 0,
    index_file_name: str = "index.csv",
    with_boundary_rows: bool = True,
) -> dict:
    """Create `<root>/<name>_train` and `<root>/<name>_test` folders.

    Returns a dict with paths suitable for the data config block.
    """
    import cv2
    import pandas as pd

    rng = np.random.RandomState(seed)
    classes = list(classes or CS_CLASSNAMES[:4])
    root = Path(root)

    def class_color(ci: int) -> np.ndarray:
        # well-separated colors on a hue-like wheel
        phase = 2 * np.pi * ci / max(len(classes), 1)
        return np.array([
            128 + 100 * np.sin(phase),
            128 + 100 * np.sin(phase + 2.1),
            128 + 100 * np.sin(phase + 4.2),
        ])

    def write_split(split: str, n_per_class: int) -> Path:
        folder = root / f"{name}_{split}"
        folder.mkdir(parents=True, exist_ok=True)
        rows = []
        for ci, cname in enumerate(classes):
            for j in range(n_per_class):
                fname = f"{split}_{ci:02d}_{j:03d}.jpg"
                img = class_color(ci)[None, None, :] + rng.normal(
                    0, 25, size=(image_size, image_size, 3))
                img = np.clip(img, 0, 255).astype(np.uint8)
                cv2.imwrite(str(folder / fname), img[:, :, ::-1])  # RGB->BGR
                plot_id = f"PLOT{ci:02d}_{j % 3:02d}"  # 3 plots per class
                if with_boundary_rows and j == n_per_class - 1:
                    # boundary plot falls back to the polygon label
                    rows.append({"file": fname,
                                 "BH_PLOT_DESC": BOUNDARY_PLOT_LABEL,
                                 "BH_POLYDESC": cname, "ID": plot_id})
                else:
                    rows.append({"file": fname, "BH_PLOT_DESC": cname,
                                 "BH_POLYDESC": cname, "ID": plot_id})
        # one unlabeled row + one unlabeled file to exercise filtering
        blank = f"{split}_unlabeled.jpg"
        cv2.imwrite(str(folder / blank),
                    np.zeros((image_size, image_size, 3), np.uint8))
        rows.append({"file": blank, "BH_PLOT_DESC": "", "BH_POLYDESC": "",
                     "ID": "PLOTX"})
        pd.DataFrame(rows).to_csv(folder / index_file_name, index=False)
        return folder

    train_dir = write_split("train", n_train_per_class)
    test_dir = write_split("test", n_test_per_class)

    return {
        "train_dir": str(train_dir),
        "test_dir": str(test_dir),
        "index_file_name": index_file_name,
        "classes": classes,
        "dataset_paths": [str(train_dir)],
        "index_file_names": [index_file_name],
    }
