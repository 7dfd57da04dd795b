#!/usr/bin/env python
"""Embedding-cache visualizer: PCA pre-reduction + UMAP/t-SNE to 2D,
interactive HTML (plotly when available, matplotlib fallback).

Capability parity with `/root/reference/feat_cache_vis/feat_vis.py`:
loads ``embeddings.npy`` + ``metadata.csv`` from an embedding-cache
directory, optionally PCA-reduces, projects to 2D, saves
``vis_{umap,tsne}_coords.npy`` and an interactive scatter colored by label.

Usage:
    python -m aihab_clip_tpu.tools.feat_vis --cache_dir feat_cache_vis/... \
        --method tsne [--pca_dim 50] [--out_dir .]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cache_dir", type=str, required=True,
                   help="embedding-cache dir (embeddings.npy + metadata.csv)")
    p.add_argument("--method", type=str, default="umap",
                   choices=["umap", "tsne"])
    p.add_argument("--pca_dim", type=int, default=0,
                   help="PCA pre-reduction dim (0 = off)")
    p.add_argument("--n_neighbors", type=int, default=15, help="UMAP knn")
    p.add_argument("--min_dist", type=float, default=0.1, help="UMAP min_dist")
    p.add_argument("--perplexity", type=float, default=30.0, help="t-SNE")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out_dir", type=str, default=None,
                   help="output dir (default: cache_dir)")
    p.add_argument("--label_column", type=str,
                   default="ground_truth_word_label")
    return p


def reduce_to_2d(embeddings: np.ndarray, method: str, pca_dim: int = 0,
                 n_neighbors: int = 15, min_dist: float = 0.1,
                 perplexity: float = 30.0, seed: int = 42):
    """Returns (coords [N, 2], method_used) — method_used may differ from
    the request (umap-learn missing -> t-SNE fallback), and output files
    must be named by what actually ran."""
    x = embeddings.astype(np.float32)
    if pca_dim and pca_dim < x.shape[1]:
        from sklearn.decomposition import PCA

        x = PCA(n_components=pca_dim, random_state=seed).fit_transform(x)

    if method == "umap":
        try:
            import umap

            reducer = umap.UMAP(n_neighbors=n_neighbors, min_dist=min_dist,
                                n_components=2, random_state=seed)
            return reducer.fit_transform(x), "umap"
        except ImportError:
            print("[warn] umap-learn not installed; falling back to t-SNE")
            method = "tsne"

    from sklearn.manifold import TSNE

    perplexity = min(perplexity, max(2.0, (len(x) - 1) / 3.0))
    return TSNE(n_components=2, perplexity=perplexity,
                random_state=seed, init="pca").fit_transform(x), "tsne"


def plot_scatter(coords: np.ndarray, labels, out_html: Path,
                 title: str) -> None:
    try:
        import pandas as pd
        import plotly.express as px

        df = pd.DataFrame({"x": coords[:, 0], "y": coords[:, 1],
                           "label": labels})
        fig = px.scatter(df, x="x", y="y", color="label", title=title,
                         hover_data=["label"])
        fig.write_html(out_html)
        print(f"[feat_vis] interactive plot -> {out_html}")
    except ImportError:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 8))
        labels = np.asarray(labels)
        for lab in np.unique(labels):
            m = labels == lab
            ax.scatter(coords[m, 0], coords[m, 1], s=6, label=str(lab))
        ax.legend(fontsize=6, markerscale=2)
        ax.set_title(title)
        out_png = out_html.with_suffix(".png")
        fig.savefig(out_png, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"[feat_vis] plotly unavailable; static plot -> {out_png}")


def main(argv=None) -> None:
    from ..utils import honor_jax_platforms_env

    honor_jax_platforms_env()
    args = build_argparser().parse_args(argv)
    from ..cache import load_embedding_cache

    cache = load_embedding_cache(args.cache_dir)
    emb = cache["embeddings"]
    meta = cache["metadata"]
    labels = (meta[args.label_column] if args.label_column in meta.columns
              else cache["labels"])

    coords, method = reduce_to_2d(emb, args.method, args.pca_dim,
                                  args.n_neighbors, args.min_dist,
                                  args.perplexity, args.seed)

    out_dir = Path(args.out_dir or args.cache_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / f"vis_{method}_coords.npy", coords)
    print(f"[feat_vis] coords -> {out_dir / f'vis_{method}_coords.npy'}")
    plot_scatter(coords, labels, out_dir / f"vis_{method}.html",
                 f"{method.upper()} of {Path(args.cache_dir).name} "
                 f"({emb.shape[0]} pts)")


if __name__ == "__main__":
    main()
