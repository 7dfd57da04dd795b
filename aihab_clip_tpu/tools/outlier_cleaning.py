"""Embedding-geometry outlier scoring over a cached embedding split.

Capability parity with `/root/reference/tools/outlier_cleaning.py` (host
tool -> numpy/sklearn):

  * ``SingleCentroidScorer`` — per-class normalized centroid; cosine
    distance scores with per-class rank and bottom-5% flag;
  * ``MultiPrototypeScorer`` — per-class spherical k-means (K by the class-
    size heuristic n<20->1, <100->3, <200->4, <300->5, else 6, with a
    min-samples-per-prototype safety cap) scoring distance to the nearest
    true-class prototype and the cross-class best-similarity margin;
  * ``select_outliers`` / ``materialize_clean_split`` — fully implemented
    here (the reference leaves them as placeholders).

Output dataframes carry the same column contracts so downstream analyses
transfer unchanged.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

EPS = 1e-12

CENTROID_COLUMNS = [
    "file_name", "ground_truth_num_label", "ground_truth_word_label",
    "ground_truth_L2_num_label", "sim_to_centroid", "outlier_score",
    "class_size", "rank_in_class", "pct_rank_in_class", "is_bottom_5pct",
]

PROTO_COLUMNS = [
    "file_name", "ground_truth_num_label", "ground_truth_word_label",
    "ground_truth_L2_num_label", "sim_to_prototype", "outlier_score",
    "class_size", "k_per_class", "rank_in_class", "pct_rank_in_class",
    "is_bottom_5pct", "margin_to_other_class",
]


def heuristic_k(n: int) -> int:
    """Class-size -> number of prototype modes (reference heuristic)."""
    if n < 20:
        return 1
    if n < 100:
        return 3
    if n < 200:
        return 4
    if n < 300:
        return 5
    return 6


def _normalize(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    if not np.isfinite(norms).all():
        raise ValueError("Non-finite embedding norms found (NaN/Inf).")
    return x / np.maximum(norms, EPS)


@dataclasses.dataclass
class CentroidResult:
    centroids: Dict[int, np.ndarray]
    class_counts: Dict[int, int]
    dim: int


@dataclasses.dataclass
class MultiPrototypeResult:
    prototypes: Dict[int, np.ndarray]       # label -> [K, dim]
    class_counts: Dict[int, int]
    prototype_counts: Dict[int, List[int]]
    k_per_class: Dict[int, int]
    dim: int


class SingleCentroidScorer:
    def __init__(self, embeddings: np.ndarray, labels: np.ndarray,
                 metadata: pd.DataFrame, normalize_tol: float = 1e-3):
        embeddings = np.asarray(embeddings, np.float32)
        labels = np.asarray(labels).astype(int)
        if embeddings.shape[0] != labels.shape[0]:
            raise ValueError("embeddings/labels row mismatch")
        if len(metadata) != embeddings.shape[0]:
            raise ValueError("metadata/embeddings row mismatch")
        if not np.isfinite(embeddings).all():
            raise ValueError("Non-finite embeddings found (NaN/Inf).")
        self.embeddings = embeddings
        self.labels = labels
        self.metadata = metadata.reset_index(drop=True)
        self.dim = embeddings.shape[1]
        self.normalize_tol = normalize_tol
        self._normalized: Optional[np.ndarray] = None
        self._centroids: Optional[CentroidResult] = None

    def _get_normalized(self) -> np.ndarray:
        if self._normalized is None:
            norms = np.linalg.norm(self.embeddings, axis=-1)
            if np.abs(norms - 1.0).max() > self.normalize_tol:
                print(f"[warn] Unnormalized embeddings detected "
                      f"(max |norm-1|={np.abs(norms - 1).max():.3e}); normalizing.")
                self._normalized = _normalize(self.embeddings)
            else:
                self._normalized = self.embeddings
        return self._normalized

    def compute_centroids(self) -> CentroidResult:
        if self._centroids is not None:
            return self._centroids
        emb = self._get_normalized()
        centroids: Dict[int, np.ndarray] = {}
        counts: Dict[int, int] = {}
        for label in np.unique(self.labels):
            mask = self.labels == label
            mean = emb[mask].mean(axis=0)
            mean = mean / max(np.linalg.norm(mean), EPS)
            if not np.isfinite(mean).all():
                raise ValueError(f"Non-finite centroid for class {label}")
            centroids[int(label)] = mean
            counts[int(label)] = int(mask.sum())
        self._centroids = CentroidResult(centroids, counts, self.dim)
        return self._centroids

    def _base_frame(self) -> pd.DataFrame:
        scores = self.metadata.copy().reset_index(drop=True)
        scores["ground_truth_num_label"] = self.labels
        for col, default in (("ground_truth_word_label", ""),
                             ("ground_truth_L2_num_label", -1),
                             ("file_name", "")):
            if col not in scores.columns:
                scores[col] = default
        return scores

    @staticmethod
    def _rank_and_flag(scores: pd.DataFrame, sim_col: str) -> pd.DataFrame:
        scores["rank_in_class"] = (
            scores.groupby("ground_truth_num_label")["outlier_score"]
            .rank(method="first", ascending=False).astype(int))
        scores["pct_rank_in_class"] = (scores["rank_in_class"]
                                       / scores["class_size"])
        p05 = scores.groupby("ground_truth_num_label")[sim_col].transform(
            lambda col: col.quantile(0.05))
        scores["is_bottom_5pct"] = scores[sim_col] <= p05
        return scores

    def score_centroid_distance(
            self, centroids: Optional[CentroidResult] = None) -> pd.DataFrame:
        cres = centroids or self.compute_centroids()
        if cres.dim != self.dim:
            raise ValueError(
                f"Centroid dim mismatch: expected {self.dim}, got {cres.dim}")
        emb = self._get_normalized()
        missing = sorted(set(np.unique(self.labels).tolist())
                         - set(cres.centroids))
        if missing:
            raise ValueError(f"Missing centroid(s) for label(s): {missing}")

        centroid_rows = np.stack([cres.centroids[int(l)] for l in self.labels])
        sim = np.sum(emb * centroid_rows, axis=-1)

        scores = self._base_frame()
        scores["sim_to_centroid"] = sim
        scores["outlier_score"] = 1.0 - sim
        scores["class_size"] = scores["ground_truth_num_label"].map(
            cres.class_counts).astype(int)
        scores = self._rank_and_flag(scores, "sim_to_centroid")
        return scores[CENTROID_COLUMNS].sort_values(
            by=["outlier_score", "ground_truth_num_label", "file_name"],
            ascending=[False, True, True]).reset_index(drop=True)


class MultiPrototypeScorer(SingleCentroidScorer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._prototypes: Optional[MultiPrototypeResult] = None

    def compute_prototypes(
        self, k_mode: str = "heuristic", k_fixed: int = 2, k_max: int = 4,
        min_samples_per_proto: int = 15, random_state: int = 0,
        n_init: int = 10, max_iter: int = 100,
    ) -> MultiPrototypeResult:
        if k_mode not in {"heuristic", "fixed"}:
            raise ValueError(f"Unsupported k_mode '{k_mode}'.")
        from sklearn.cluster import KMeans

        emb = self._get_normalized()
        prototypes: Dict[int, np.ndarray] = {}
        class_counts: Dict[int, int] = {}
        proto_counts: Dict[int, List[int]] = {}
        k_per_class: Dict[int, int] = {}

        for label in np.unique(self.labels):
            label = int(label)
            x_c = emb[self.labels == label]
            n_c = x_c.shape[0]
            class_counts[label] = n_c
            base_k = heuristic_k(n_c) if k_mode == "heuristic" else int(k_fixed)
            k_c = max(1, min(base_k, int(k_max), n_c,
                             max(1, n_c // int(min_samples_per_proto))))

            if k_c == 1:
                center = x_c.mean(axis=0, keepdims=True)
                center = center / max(np.linalg.norm(center), EPS)
                prototypes[label] = center
                proto_counts[label] = [n_c]
                k_per_class[label] = 1
                continue

            km = KMeans(n_clusters=k_c, random_state=int(random_state),
                        n_init=int(n_init), max_iter=int(max_iter))
            km.fit(x_c.astype(np.float32))
            centers = _normalize(km.cluster_centers_.astype(np.float32))
            assign = (x_c @ centers.T).argmax(axis=1)
            prototypes[label] = centers
            proto_counts[label] = np.bincount(assign, minlength=k_c).tolist()
            k_per_class[label] = k_c

        self._prototypes = MultiPrototypeResult(
            prototypes, class_counts, proto_counts, k_per_class, self.dim)
        return self._prototypes

    def score_prototype_distance(
            self, prototypes: Optional[MultiPrototypeResult] = None
    ) -> pd.DataFrame:
        pres = prototypes or self._prototypes or self.compute_prototypes()
        emb = self._get_normalized()
        uniq = np.unique(self.labels)

        # similarity to every class's prototypes in one block matmul
        all_protos = np.concatenate([pres.prototypes[int(l)] for l in uniq], 0)
        owner = np.concatenate([
            np.full(pres.prototypes[int(l)].shape[0], int(l)) for l in uniq])
        sims = emb @ all_protos.T  # [N, total_protos]

        own_mask = owner[None, :] == self.labels[:, None]
        neg_inf = np.float32(-np.inf)
        sim_to_prototype = np.where(own_mask, sims, neg_inf).max(axis=1)
        if len(uniq) > 1:
            sim_other = np.where(~own_mask, sims, neg_inf).max(axis=1)
            margin = sim_to_prototype - sim_other
        else:
            margin = np.full_like(sim_to_prototype, np.nan)

        scores = self._base_frame()
        scores["sim_to_prototype"] = sim_to_prototype
        scores["outlier_score"] = 1.0 - sim_to_prototype
        scores["class_size"] = scores["ground_truth_num_label"].map(
            pres.class_counts).astype(int)
        scores["k_per_class"] = scores["ground_truth_num_label"].map(
            pres.k_per_class).astype(int)
        scores = self._rank_and_flag(scores, "sim_to_prototype")
        scores["margin_to_other_class"] = margin
        return scores[PROTO_COLUMNS].sort_values(
            by=["outlier_score", "ground_truth_num_label", "file_name"],
            ascending=[False, True, True]).reset_index(drop=True)


def select_outliers(
    scores: pd.DataFrame,
    mode: str = "bottom_pct",
    pct: float = 0.05,
    threshold: Optional[float] = None,
    margin_threshold: Optional[float] = None,
) -> pd.DataFrame:
    """Select rows to drop.  Modes:
      * 'bottom_pct'  — worst ``pct`` per class by outlier score;
      * 'threshold'   — outlier_score > threshold;
      * 'margin'      — margin_to_other_class < margin_threshold
                        (multi-prototype scores only).
    """
    if mode == "bottom_pct":
        flagged = scores[scores["pct_rank_in_class"] <= pct]
    elif mode == "threshold":
        if threshold is None:
            raise ValueError("mode='threshold' requires threshold")
        flagged = scores[scores["outlier_score"] > threshold]
    elif mode == "margin":
        if margin_threshold is None:
            raise ValueError("mode='margin' requires margin_threshold")
        if "margin_to_other_class" not in scores.columns:
            raise ValueError("margin mode requires multi-prototype scores")
        flagged = scores[scores["margin_to_other_class"] < margin_threshold]
    else:
        raise ValueError(f"Unsupported selection mode '{mode}'")
    return flagged.reset_index(drop=True)


def materialize_clean_split(
    scores_or_selected: pd.DataFrame,
    src_dir: Path,
    dst_dir: Path,
    index_file_name: str,
    copy: bool = True,
) -> Dict[str, int]:
    """Write a cleaned dataset folder: copy (or link) every image NOT in the
    selected-outlier set and a filtered index CSV."""
    import shutil

    src_dir, dst_dir = Path(src_dir), Path(dst_dir)
    dst_dir.mkdir(parents=True, exist_ok=True)
    drop = set(scores_or_selected["file_name"].astype(str).str.lower())

    index = pd.read_csv(src_dir / index_file_name)
    keep_mask = ~index["file"].astype(str).str.lower().isin(drop)
    index[keep_mask].to_csv(dst_dir / index_file_name, index=False)

    kept = dropped = 0
    for f in sorted(src_dir.iterdir()):
        if not f.is_file() or f.name == index_file_name:
            continue
        if f.suffix.lower() not in (".jpg", ".jpeg", ".png", ".bmp"):
            continue
        if f.name.lower() in drop:
            dropped += 1
            continue
        target = dst_dir / f.name
        if copy:
            shutil.copy2(f, target)
        else:
            if not target.exists():
                target.symlink_to(f.resolve())
        kept += 1
    return {"kept": kept, "dropped": dropped}
