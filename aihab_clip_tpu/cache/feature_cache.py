"""Pre-projection feature cache.

Same cache layout contract as the reference
(`/root/reference/aihab_utils/feature_cache.py:15-43,189-261`):

    <root>/features_<backbone>_<dataset>/<shots>_shot/seed<seed>/
        f{v}.npy      per-view pre-projection features   [N, pre_dim] fp16
        label.npy     labels (written once)              [N] int32
        manifest.json shapes / dtype / backbone / views

but with raw ``.npy`` artifacts (memory-mappable, no pickle) instead of
``torch.save`` — reads are a single mmap + optional device put, which is
what the feature-cache GB/s north-star measures.  Each view ``v`` is one
augmentation pass of the train split (device-side augmentation keyed by
``fold_in(seed, view)``), reproducing the reference's "selection once per
seed, variation via aug_views" model with explicit PRNG keys.

Remote roots: set ``root_path: gs://bucket/prefix`` (any tensorstore
kvstore URI) and the same cache tree is written as zarr arrays through
``cache.array_store.TensorStoreStore`` — tested against ``file://`` URIs,
which run the identical code path.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from .array_store import join_cache_path, open_store

CacheDir = Union[str, Path]


def canonical_backbone_name(backbone: str) -> str:
    """Canonicalize backbone names for cache folder naming (same scheme as
    the reference so cache trees are interchangeable)."""
    if not backbone:
        return "unknown"
    if backbone == "ViT-B/16":
        return "ViTB16"
    if backbone == "ViT-B/32":
        return "ViTB32"
    name = backbone.replace("hf-hub:", "hf-hub_")
    return name.replace("/", "_").replace(" ", "_").replace(":", "_")


def resolve_model_name(cfg, default_backend: str = "openai",
                       default_backbone: str = "RN50") -> str:
    """The ONE config -> canonical model name resolution, shared by the
    feature cache, the embedding cache, and checkpointing so cache and
    checkpoint trees always agree on a run's model name."""
    backend = str(cfg.get("clip_backend", default_backend)).lower()
    if backend == "openclip":
        raw = cfg.get("open_clip_model",
                      cfg.get("backbone", default_backbone))
    else:
        raw = cfg.get("backbone", default_backbone)
    return canonical_backbone_name(str(raw))


def feature_cache_dir(cfg) -> CacheDir:
    """Cache directory (a Path, or a URI string for remote roots)."""
    root = cfg.get("root_path", "./")
    backbone = resolve_model_name(cfg)
    dataset = cfg.get("dataset", "cs")
    shots = int(cfg.get("shots", 0) or 0)
    seed = int(cfg.get("seed", 1) or 1)
    return join_cache_path(root, f"features_{backbone}_{dataset}",
                           f"{shots}_shot", f"seed{seed}")


def feature_cache_exists(cache_dir: CacheDir, aug_views: int) -> bool:
    store = open_store(cache_dir)
    if not store.exists("label"):
        return False
    return all(store.exists(f"f{v}") for v in range(aug_views))


def write_preprojection_cache(
    cache_dir: CacheDir,
    encode_view: Callable[[int], Tuple[np.ndarray, np.ndarray]],
    aug_views: int,
    expected_n: Optional[int] = None,
    feature_dtype=np.float16,
    shard_index: Optional[int] = None,
    shard_count: Optional[int] = None,
) -> Dict:
    """Write the cache: ``encode_view(v)`` returns (features [N, D] np,
    labels [N] np) for augmentation view ``v``.

    Multi-host: each process encodes its own data shard (see
    ``parallel.distributed.process_shard_indices``) and writes with its
    ``shard_index``; the reader concatenates shards in order.

    Performs the reference's write-then-reload validation (shape check,
    row/label agreement, expected-count check) and records everything in
    ``manifest.json``."""
    store = open_store(cache_dir)
    store.ensure()
    suffix = "" if shard_index is None else f".shard{shard_index}"

    manifest: Dict = {"views": [], "aug_views": aug_views,
                      "shard_index": shard_index,
                      "shard_count": shard_count}
    t0 = time.perf_counter()
    total_bytes = 0
    labels_ref: Optional[np.ndarray] = None

    for v in range(aug_views):
        feats, labels = encode_view(v)
        if feats.dtype != feature_dtype:  # usually cast on device already
            feats = np.asarray(feats, dtype=feature_dtype)
        labels = np.asarray(labels, dtype=np.int32)

        fpath = store.save(f"f{v}{suffix}", feats)
        total_bytes += feats.nbytes

        if v == 0:
            labels_ref = labels
            lpath = store.save(f"label{suffix}", labels)
            total_bytes += labels.nbytes
            print(f"[cache] labels -> {lpath} "
                  f"shape={labels.shape} unique={len(np.unique(labels))}")

        # write-then-reload validation
        loaded = store.load(f"f{v}{suffix}", mmap=True)
        ok_shape = loaded.shape == feats.shape
        ok_count = feats.shape[0] == labels_ref.shape[0]
        ok_expected = expected_n is None or feats.shape[0] == expected_n
        print(f"[cache] view {v} -> {fpath} shape={feats.shape} "
              f"dtype={feats.dtype} reload_ok={ok_shape} "
              f"rows_match_labels={ok_count} rows_match_expected={ok_expected}")
        if not (ok_shape and ok_count and ok_expected):
            raise RuntimeError(
                f"Feature cache validation failed for view {v}: "
                f"reload_ok={ok_shape} rows_match_labels={ok_count} "
                f"rows_match_expected={ok_expected} "
                f"(got {feats.shape[0]} rows, expected {expected_n})")

        manifest["views"].append({
            "file": f"f{v}{suffix}", "shape": list(feats.shape),
            "dtype": str(feats.dtype),
        })

    dt = time.perf_counter() - t0
    manifest.update({
        "n": int(labels_ref.shape[0]),
        "dim": int(manifest["views"][0]["shape"][1]),
        "write_seconds": dt,
        "write_gbps": total_bytes / max(dt, 1e-9) / 1e9,
    })
    store.write_json(f"manifest{suffix}.json", manifest)
    print("\nFeature caching complete.")
    return manifest


def read_preprojection_cache(
    cache_dir: CacheDir,
    aug_views: int,
    max_label: Optional[int] = None,
    mmap: bool = True,
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Load cached views + labels.  ``max_label`` filters rows whose label
    exceeds the class count (reference `/root/reference/methods/ProLIP.py:105-113`).

    Reads both single-file views (``f{v}``) and multi-host sharded views
    (``f{v}.shard{k}``, concatenated in shard order)."""
    store = open_store(cache_dir)
    # kick off kernel readahead for every file we are about to load, so
    # the per-file reads overlap IO with header parsing / concatenation
    if hasattr(store, "prefetch"):
        for v in range(aug_views):
            for nm in ([f"f{v}"] + _shard_names(store, f"f{v}")):
                store.prefetch(nm)
    labels = np.asarray(_load_maybe_sharded(store, "label"))
    keep = None
    if max_label is not None and (labels >= max_label).any():
        keep = np.where(labels < max_label)[0]
        labels = labels[keep]
    views = []
    for v in range(aug_views):
        arr = _load_maybe_sharded(store, f"f{v}", mmap=mmap)
        # avoid fancy-indexing (row-gather copy) when nothing is filtered
        views.append(np.asarray(arr) if keep is None else np.asarray(arr[keep]))
    return views, labels


def _shard_names(store, stem: str) -> List[str]:
    names = [n for n in store.list_arrays(f"{stem}.shard")
             if n.startswith(f"{stem}.shard")]
    return sorted(names, key=lambda n: int(n.split("shard")[-1]))


def _load_maybe_sharded(store, stem: str, mmap: bool = False):
    if store.exists(stem):
        return store.load(stem, mmap=mmap)
    shards = _shard_names(store, stem)
    if not shards:
        raise FileNotFoundError(f"no cache array '{stem}' in {store.root}")
    # completeness: indices must be contiguous from 0, and when a shard
    # manifest records the writer fleet's size, ALL shards must be present
    # (a faster host must not silently train on a truncated dataset)
    idx = [int(n.split("shard")[-1]) for n in shards]
    if idx != list(range(len(idx))):
        raise RuntimeError(
            f"cache '{stem}' has non-contiguous shards {idx} in "
            f"{store.root} — a writer shard is missing or still running")
    expected = None
    for k in idx:
        try:
            expected = store.read_json(f"manifest.shard{k}.json").get(
                "shard_count")
            if expected:
                break
        except Exception:
            continue
    if expected and len(idx) != int(expected):
        raise RuntimeError(
            f"cache '{stem}' has {len(idx)} shards but the writer fleet "
            f"had {expected} processes — wait for all hosts to finish "
            f"writing (or check for failed writers)")
    return np.concatenate([store.load(n) for n in shards], axis=0)


def feature_cache_exists_sharded(cache_dir: CacheDir, aug_views: int) -> bool:
    """Like feature_cache_exists but accepts per-process shard layouts."""
    store = open_store(cache_dir)
    if not (store.exists("label") or _shard_names(store, "label")):
        return False
    for v in range(aug_views):
        if not (store.exists(f"f{v}") or _shard_names(store, f"f{v}")):
            return False
    return True


def cache_features_from_loader(
    cfg,
    model,
    params,
    train_view,
    resolution: int,
    info: Dict,
    compute_dtype=jnp.bfloat16,
    shard_index: Optional[int] = None,
    shard_count: Optional[int] = None,
) -> Dict:
    """End-to-end cache writer: run the train split through the frozen
    encoder once per augmentation view (device-side train augmentation,
    per-view PRNG key) and stream pre-projection features to the cache.

    Rows are written in DETERMINISTIC split order for every view, so each
    ``f{v}`` aligns with the single ``label`` file; augmentation variation
    across views comes only from the per-view PRNG key.  (The reference
    iterates its *shuffled* train loader once per view while keeping only
    view 0's labels — `/root/reference/aihab_utils/feature_cache.py:205-224`
    with `shuffle: True` at `/root/reference/configs/cs.yaml:16` — which
    silently misaligns labels for views >= 1.  Deterministic order loses
    nothing: view variation never came from sample order.)

    Multi-host: when ``shard_count > 1`` (defaults to ``jax.process_count()``)
    each process encodes a deterministic, disjoint shard of the split and
    writes ``f{v}.shard{k}.npy``; ``read_preprojection_cache`` merges shards
    in order.

    Reference flow: `/root/reference/aihab_utils/feature_cache.py:189-251`.
    """
    from ..ops.fast_warp import fast_train_transform
    from ..ops.preprocess import normalize_stats_for, train_transform

    nmean, nstd = normalize_stats_for(getattr(model, "config", None))
    cache_dir = feature_cache_dir(cfg)
    aug_views = int(cfg.get("aug_views", 1) or 1)
    seed = int(cfg.get("seed", 1) or 1)
    aug = cfg["data"]["preprocessing"].get("augmentations", {})
    crop_mode = ("bottom" if aug.get("bottom_crop", False)
                 else "random" if aug.get("random_crop", False) else "center")
    aug_fn = (fast_train_transform
              if str(cfg.get("aug_impl", "fast")) == "fast"
              else train_transform)

    # caching always iterates in deterministic split order (see docstring)
    from ..data.pipeline import SplitView

    cache_view = SplitView(train_view.dataset, train_view.indices,
                           train_view.batch_size, shuffle=False,
                           use_l2_label=train_view.use_l2_label)

    if shard_count is None:
        shard_count = jax.process_count()
    if shard_count > 1:
        from ..parallel.distributed import process_shard_indices

        if shard_index is None:
            shard_index = jax.process_index()
        pos = process_shard_indices(cache_view.num_samples, seed=seed,
                                    process_index=shard_index,
                                    process_count=shard_count)
        cache_view = SplitView(cache_view.dataset, cache_view.indices[pos],
                               cache_view.batch_size, shuffle=False,
                               use_l2_label=cache_view.use_l2_label)
        expected_n = cache_view.num_samples
    else:
        shard_index = None
        expected_n = info.get("train_size")

    print("\n==== Feature Caching (pre-projection) ====")
    print({"cache_dir": str(cache_dir), "aug_views": aug_views,
           "expected_train_size": info.get("train_size"),
           "shard": (None if shard_index is None
                     else f"{shard_index}/{shard_count}"),
           "crop_mode": crop_mode})

    from ..models.fast_vit import encode_image_fastest, pack_fastest

    # params are static on the cache-writer path — build the per-family
    # fast pack once (SigLIP qkv groups / ConvNeXt banded dw / folded RN)
    pack = pack_fastest(model, params, getattr(model, "config", None),
                        compute_dtype)

    @jax.jit
    def encode_batch(params, pk, images_u8, key):
        # params/pack are ARGUMENTS, not closure constants (closing over
        # a real tower embeds hundreds of MB into the compiled program)
        x = aug_fn(images_u8, key, resolution, crop_mode=crop_mode,
                   flip=bool(aug.get("flip", False)),
                   rotation=bool(aug.get("rotation", False)),
                   dtype=compute_dtype, mean=nmean, std=nstd)
        pre = encode_image_fastest(model, params, x,
                                   getattr(model, "config", None),
                                   packed=pk)
        # cast to the on-disk dtype ON DEVICE: numpy's fp32->fp16 convert is
        # ~0.25 GB/s and would bottleneck the cache writer
        return pre.astype(jnp.float16)

    def encode_view(v: int):
        feats, labels = [], []
        base = jax.random.fold_in(jax.random.key(seed), v)
        pending = None  # lag-1 fetch: device computes batch i while the
        # host gathers/uploads batch i+1 (fetching immediately would
        # serialize host prep behind every device step)
        for bi, batch in enumerate(cache_view.batches()):
            key = jax.random.fold_in(base, bi)
            pre = encode_batch(params, pack, jnp.asarray(batch.images), key)
            if pending is not None:
                p_pre, p_valid = pending
                feats.append(np.asarray(p_pre)[p_valid])
            pending = (pre, batch.valid)
            labels.append(batch.labels[batch.valid])
        if pending is not None:
            p_pre, p_valid = pending
            feats.append(np.asarray(p_pre)[p_valid])
        return np.concatenate(feats, 0), np.concatenate(labels, 0)

    return write_preprojection_cache(
        cache_dir, encode_view, aug_views,
        expected_n=expected_n, shard_index=shard_index,
        shard_count=shard_count if shard_count and shard_count > 1 else None)
