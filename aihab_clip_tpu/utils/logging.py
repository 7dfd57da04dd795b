"""Experiment logging: W&B when available, stdout-JSONL fallback.

The reference logs scalars / confusion-matrix tables / per-sample tables
to W&B (`/root/reference/main.py:80-147`,
`/root/reference/aihab_utils/evaluation.py:67,337-345`).  This logger keeps
that surface but degrades gracefully: without the wandb package (or with
``mode='stdout'``) every payload is emitted as one JSON line to stdout and
appended to ``<run_dir>/log.jsonl``, and tables/images are written as
CSV/PNG files under the run directory.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

try:
    import wandb

    _HAS_WANDB = True
except ImportError:  # pragma: no cover
    wandb = None
    _HAS_WANDB = False


def _jsonable(v: Any) -> Any:
    if isinstance(v, (np.generic,)):
        return v.item()
    if isinstance(v, np.ndarray):
        return v.tolist()
    if hasattr(v, "item") and getattr(v, "ndim", None) == 0:
        return v.item()
    return v


class RunLogger:
    """Unified logger. ``mode``: 'auto' (wandb if importable), 'wandb',
    'stdout', 'off'."""

    def __init__(self, project: Optional[str], run_name: str,
                 config: Optional[Dict] = None, mode: str = "auto",
                 run_dir: Optional[str] = None):
        self.run_name = run_name
        self.run_dir = Path(run_dir or f"runs/{run_name}_{int(time.time())}")
        self._wandb_run = None
        self._mode = mode

        use_wandb = (mode == "wandb") or (mode == "auto" and _HAS_WANDB
                                          and project)
        if use_wandb and _HAS_WANDB:
            self._wandb_run = wandb.init(project=project, name=run_name,
                                         config=config or {})
        elif mode != "off":
            self.run_dir.mkdir(parents=True, exist_ok=True)
            if config is not None:
                (self.run_dir / "config.json").write_text(
                    json.dumps({k: _jsonable(v) for k, v in dict(config).items()},
                               default=str, indent=2))

    @property
    def active(self) -> bool:
        return self._mode != "off"

    def log(self, payload: Dict[str, Any]) -> None:
        if self._mode == "off":
            return
        if self._wandb_run is not None:
            self._wandb_run.log(payload)
            return
        line = json.dumps({k: _jsonable(v) for k, v in payload.items()},
                          default=str)
        print(f"[log] {line}")
        with (self.run_dir / "log.jsonl").open("a") as f:
            f.write(line + "\n")

    def log_table(self, name: str, df) -> None:
        if self._mode == "off":
            return
        if self._wandb_run is not None:
            self._wandb_run.log({name: wandb.Table(dataframe=df)})
            return
        self.run_dir.mkdir(parents=True, exist_ok=True)
        path = self.run_dir / f"{name.replace(' ', '_')}.csv"
        df.to_csv(path, index=False)
        print(f"[log] table '{name}' -> {path}")

    def log_confusion_matrix(self, cm: np.ndarray, label_list) -> None:
        """Log the CM as a table + rendered heatmaps (raw and
        row-normalized), mirroring the reference's ``draw_cm``."""
        if self._mode == "off" or cm is None:
            return
        import pandas as pd

        rows = [[label_list[i]] + list(map(int, cm[i]))
                for i in range(len(label_list))]
        df = pd.DataFrame(rows, columns=["true_label"] + list(label_list))
        self.log_table("confusion_matrix", df)
        try:
            self._draw_cm(cm, label_list)
        except Exception as exc:  # matplotlib backend issues are non-fatal
            print(f"[log] cm plot skipped: {exc}")

    def _draw_cm(self, cm: np.ndarray, label_list) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        def plot(matrix, normalized: bool):
            title = "Confusion Matrix L3" + (" (Normalized)" if normalized else "")
            fig = plt.figure(figsize=(15, 12))
            if normalized:
                annot = np.vectorize(
                    lambda x: "0" if x == 0 else f"{x:.2f}")(matrix)
                sns.heatmap(matrix, annot=annot, fmt="", cmap="Blues",
                            xticklabels=label_list, yticklabels=label_list)
            else:
                sns.heatmap(matrix, annot=matrix.astype(int), fmt="d",
                            cmap="Blues", xticklabels=label_list,
                            yticklabels=label_list)
            plt.xlabel("Predicted")
            plt.ylabel("True")
            plt.title(title)
            plt.tight_layout()
            if self._wandb_run is not None:
                self._wandb_run.log({"Confusion Matrix": wandb.Image(fig)})
            else:
                fname = ("confusion_matrix_norm.png" if normalized
                         else "confusion_matrix.png")
                fig.savefig(self.run_dir / fname, dpi=80)
                print(f"[log] cm heatmap -> {self.run_dir / fname}")
            plt.close(fig)

        plot(cm, normalized=False)
        row_sums = cm.sum(axis=1, keepdims=True).astype(np.float64)
        row_sums[row_sums == 0] = 1
        plot(cm / row_sums, normalized=True)

    def finish(self) -> None:
        if self._wandb_run is not None:
            self._wandb_run.finish()
