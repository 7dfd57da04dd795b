"""CSV index ingestion: file name -> habitat labels.

Capability parity with the reference's per-image lookup
(`/root/reference/data/dataset.py:17-75`) with an O(1) design: the CSV is
parsed once into a hash index keyed by lowercased file name instead of
re-scanning the dataframe for every image (the reference's per-file scan is
O(N^2) over the folder).

Label semantics preserved exactly:
  * rows without a valid BH_PLOT_DESC are dropped;
  * the plot description maps to the reassigned L3 id (unknown -> None);
  * "Boundary and Linear Features" plots fall back to the polygon label;
  * the plot ID (survey square/plot identifier) is the grouping key for
    stratified-group splits.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional

import pandas as pd

from ..taxonomy import BOUNDARY_PLOT_LABEL, REASSIGN_NAME_LABEL_L3L2


@dataclasses.dataclass
class ImageRecord:
    plot_label: Optional[int]      # reassigned L3 id (None if unlabeled)
    plot_word_label: str
    poly_label: Optional[int]
    poly_word_label: str
    plot_id: object                # grouping key (survey plot)


class LabelIndex:
    """Hash index over an index CSV (columns: file, BH_PLOT_DESC,
    optionally BH_POLYDESC, ID)."""

    def __init__(self, csv_path: str | Path, verbose: bool = False):
        self.csv_path = Path(csv_path)
        df = pd.read_csv(self.csv_path)
        self._records: Dict[str, ImageRecord] = {}
        self._verbose = verbose

        has_poly = "BH_POLYDESC" in df.columns
        files = df["file"].astype(str).str.lower()
        plot_desc = df["BH_PLOT_DESC"]
        ids = df["ID"] if "ID" in df.columns else pd.Series([""] * len(df))
        poly_desc = df["BH_POLYDESC"] if has_poly else pd.Series([""] * len(df))

        for fname, pdesc, pid, odesc in zip(files, plot_desc, ids, poly_desc):
            if pd.isna(pdesc) or pdesc == "":
                continue  # invalid row: no plot description
            if fname in self._records:
                if verbose:
                    print(f"Warning: Multiple entries found for {fname}")
                continue  # keep the first valid row (reference takes values[0])

            odesc = "" if pd.isna(odesc) else str(odesc)
            poly_pair = REASSIGN_NAME_LABEL_L3L2.get(odesc)
            poly_label = poly_pair[0] if poly_pair else None

            pdesc = str(pdesc)
            plot_pair = REASSIGN_NAME_LABEL_L3L2.get(pdesc)
            plot_label = plot_pair[0] if plot_pair else None
            if plot_label is None and verbose:
                print(f"Unrecognized label {pdesc} found in the dataset")

            # Boundary plots have no habitat class; fall back to polygon label
            if pdesc == BOUNDARY_PLOT_LABEL:
                plot_label = poly_label
                pdesc = odesc

            self._records[fname] = ImageRecord(
                plot_label=plot_label,
                plot_word_label=pdesc,
                poly_label=poly_label,
                poly_word_label=odesc,
                plot_id=pid,
            )

    def lookup(self, image_name: str) -> Optional[ImageRecord]:
        return self._records.get(image_name.lower())

    def __len__(self) -> int:
        return len(self._records)
