"""Post-projection embedding cache (for visualization / outlier tools).

Layout contract mirrors the reference
(`/root/reference/aihab_utils/feature_cache.py:53-186`):

    <cache_embeddings_dir>/<backbone>_<dataset>/<split>/seed<seed>/
        embeddings.npy   [N, dim] fp32 (optionally L2-normalized)
        labels.npy       [N] int32
        metadata.csv     file_name, ground-truth L3 num/word label, L2 label
        meta.json        timestamp, split, dims, normalization, checkpoint

Like the feature cache, the root may be a tensorstore URI
(``gs://bucket/...``); arrays are then zarr and the CSV/JSON ride the
kvstore.
"""

from __future__ import annotations

import io
from datetime import datetime
from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from .array_store import is_remote_root, join_cache_path, open_store
from .feature_cache import resolve_model_name

CacheDir = Union[str, Path]

METADATA_COLUMNS = [
    "file_name",
    "ground_truth_num_label",
    "ground_truth_word_label",
    "ground_truth_L2_num_label",
]


def embedding_cache_dir(cfg, split: str) -> CacheDir:
    root = cfg.get("root_path", "./")
    ft_cfg = cfg.get("finetune", {})
    out_root = ft_cfg.get("cache_embeddings_dir", "feat_cache_vis")
    if is_remote_root(out_root):
        pass  # absolute URI wins
    elif is_remote_root(root):
        out_root = join_cache_path(root, str(out_root))
    elif not Path(out_root).is_absolute():
        out_root = Path(root) / out_root

    backbone = resolve_model_name(cfg)
    dataset = cfg.get("dataset", "cs")
    seed = int(cfg.get("seed", 1) or 1)
    return join_cache_path(out_root, f"{backbone}_{dataset}",
                           str(split).lower(), f"seed{seed}")


def cache_embeddings(
    cfg,
    model,
    params,
    view,
    resolution: int,
    split: str = "test",
    checkpoint_path: Optional[str] = None,
    compute_dtype=jnp.float32,
) -> Path:
    """Encode a split with the (fine-tuned) model and persist embeddings +
    labels + metadata."""
    import pandas as pd

    from ..ops.preprocess import eval_transform, normalize_stats_for

    nmean, nstd = normalize_stats_for(model.config)
    ft_cfg = cfg.get("finetune", {})
    do_normalize = bool(ft_cfg.get("cache_embeddings_normalize", True))
    cache_dir = embedding_cache_dir(cfg, split)
    store = open_store(cache_dir)
    store.ensure()

    @jax.jit
    def encode(params, images_u8):
        # params as an argument, never a closure constant (DEV_NOTES.md)
        x = eval_transform(images_u8, resolution, dtype=compute_dtype,
                           mean=nmean, std=nstd)
        _, post = model.apply({"params": params}, x,
                              method=type(model).encode_image, project=True)
        post = post.astype(jnp.float32)
        if do_normalize:
            post = post / jnp.maximum(
                jnp.linalg.norm(post, axis=-1, keepdims=True), 1e-12)
        return post

    feats, labels, rows = [], [], []
    pending = None  # lag-1 fetch: overlap host gather with device encode
    for batch in view.batches():
        emb_dev = encode(params, jnp.asarray(batch.images))
        if pending is not None:
            p_emb, p_valid = pending
            feats.append(np.asarray(p_emb)[p_valid])
        pending = (emb_dev, batch.valid)
        labels.append(batch.labels[batch.valid])
        for meta, lbl in zip(view.metadata_rows(batch.indices),
                             batch.labels[batch.valid]):
            rows.append({
                "file_name": meta.get("file_name", ""),
                "ground_truth_num_label": int(lbl),
                "ground_truth_word_label": meta.get("plot_word_label", ""),
                "ground_truth_L2_num_label": meta.get("l2_label", -1),
            })
    if pending is not None:
        p_emb, p_valid = pending
        feats.append(np.asarray(p_emb)[p_valid])

    feats_all = np.concatenate(feats, 0).astype(np.float32)
    labels_all = np.concatenate(labels, 0).astype(np.int32)

    store.save("embeddings", feats_all)
    store.save("labels", labels_all)
    store.write_text("metadata.csv",
                     pd.DataFrame(rows).reindex(columns=METADATA_COLUMNS)
                     .to_csv(index=False))

    info = {
        "timestamp": datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
        "split": str(split),
        "normalized": do_normalize,
        "num_samples": int(feats_all.shape[0]),
        "dim": int(feats_all.shape[1]),
        "checkpoint_path": str(checkpoint_path) if checkpoint_path else None,
        "cache_dir": str(cache_dir),
    }
    store.write_json("meta.json", info)

    print("\n==== Embedding Cache ====")
    print({k: info[k] for k in ("cache_dir", "num_samples", "dim", "normalized")})
    return cache_dir


def load_embedding_cache(cache_dir: CacheDir) -> Dict:
    """Strict load with row/label cross-checks (the contract the outlier
    tools rely on; reference `/root/reference/tools/outlier_cleaning.py:128-173`)."""
    import pandas as pd

    store = open_store(cache_dir)
    emb = np.asarray(store.load("embeddings"))
    labels = np.asarray(store.load("labels"))
    meta = pd.read_csv(io.StringIO(store.read_text("metadata.csv")))
    info = store.read_json("meta.json")

    if emb.shape[0] != labels.shape[0]:
        raise ValueError(
            f"embeddings rows ({emb.shape[0]}) != labels rows ({labels.shape[0]})")
    if len(meta) != emb.shape[0]:
        raise ValueError(
            f"metadata rows ({len(meta)}) != embeddings rows ({emb.shape[0]})")
    if "ground_truth_num_label" in meta.columns:
        if not np.array_equal(meta["ground_truth_num_label"].to_numpy(), labels):
            raise ValueError("metadata labels disagree with labels.npy")
    return {"embeddings": emb, "labels": labels, "metadata": meta, "info": info}
