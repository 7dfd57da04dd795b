"""Bulk image loading: decode + resize every labeled image into one
uint8 array held in RAM.

Same artifact contract as the reference's bulk loader
(`/root/reference/data/dataset.py:85-200`) — a [N, R, R, 3] uint8 array plus
parallel metadata lists — but parallelized across a thread pool (cv2 releases
the GIL during decode/resize) instead of the reference's serial loop, and
with an optional on-disk ``.npy`` cache so repeat runs memory-map instead of
re-decoding.

Channel order: the loader emits RGB by default.  (The reference feeds
cv2's BGR output straight into PIL, silently swapping channels;
``channel_order='bgr'`` reproduces that behavior bit-for-bit when needed
for comparison runs.)
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..taxonomy import CORRUPT_IMAGES, convert_to_coarse_label
from .index import LabelIndex

_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


@dataclasses.dataclass
class ImageArrayDataset:
    """The bulk-loaded dataset: images + aligned metadata columns."""

    images: np.ndarray              # [N, R, R, 3] uint8
    labels: np.ndarray              # [N] int64 (reassigned L3 ids)
    l2_labels: np.ndarray           # [N] int64
    poly_labels: np.ndarray         # [N] int64 (-1 when absent)
    plot_word_labels: List[str]
    poly_word_labels: List[str]
    file_names: List[str]
    plot_idx: List[object]
    image_sources: List[str]

    def __len__(self) -> int:
        return len(self.labels)

    def select(self, idx: np.ndarray) -> "ImageArrayDataset":
        idx = np.asarray(idx)
        return ImageArrayDataset(
            images=self.images[idx],
            labels=self.labels[idx],
            l2_labels=self.l2_labels[idx],
            poly_labels=self.poly_labels[idx],
            plot_word_labels=[self.plot_word_labels[i] for i in idx],
            poly_word_labels=[self.poly_word_labels[i] for i in idx],
            file_names=[self.file_names[i] for i in idx],
            plot_idx=[self.plot_idx[i] for i in idx],
            image_sources=[self.image_sources[i] for i in idx],
        )

    def concat(self, other: "ImageArrayDataset") -> "ImageArrayDataset":
        return ImageArrayDataset(
            images=np.concatenate([self.images, other.images], 0),
            labels=np.concatenate([self.labels, other.labels], 0),
            l2_labels=np.concatenate([self.l2_labels, other.l2_labels], 0),
            poly_labels=np.concatenate([self.poly_labels, other.poly_labels], 0),
            plot_word_labels=self.plot_word_labels + other.plot_word_labels,
            poly_word_labels=self.poly_word_labels + other.poly_word_labels,
            file_names=self.file_names + other.file_names,
            plot_idx=self.plot_idx + other.plot_idx,
            image_sources=self.image_sources + other.image_sources,
        )

    def metadata_row(self, i: int) -> dict:
        return {
            "l2_label": int(self.l2_labels[i]),
            "poly_label": int(self.poly_labels[i]),
            "plot_word_label": self.plot_word_labels[i],
            "poly_word_label": self.poly_word_labels[i],
            "file_name": self.file_names[i],
            "plot_idx": self.plot_idx[i],
            "image_source": self.image_sources[i],
        }


def _decode_resize(path: str, resize_dim: int, channel_order: str) -> Optional[np.ndarray]:
    import cv2

    img = cv2.imread(path)  # BGR, HWC uint8
    if img is None:
        return None
    img = cv2.resize(img, (resize_dim, resize_dim))
    if channel_order == "rgb":
        img = img[:, :, ::-1]
    return np.ascontiguousarray(img)


def load_folder(
    folder_path: str | Path,
    index_file_name: str,
    resize_dim: int,
    channel_order: str = "rgb",
    num_workers: int = 0,
    verbose: bool = False,
    prescale: bool = True,
) -> ImageArrayDataset:
    """Load every labeled, non-corrupt image in a folder into RAM."""
    folder = Path(folder_path)
    index = LabelIndex(folder / index_file_name, verbose=verbose)

    image_files = sorted(
        f for f in os.listdir(folder)
        if f.lower().endswith(_IMAGE_EXTS) and f not in CORRUPT_IMAGES
    )

    # resolve labels first so only labeled files are decoded
    todo: List[Tuple[str, object]] = []
    for f in image_files:
        rec = index.lookup(f)
        if rec is not None and rec.plot_label is not None:
            todo.append((f, rec))
        elif verbose:
            print(f"Image {f} not found or has no BH PLOT")

    workers = num_workers if num_workers > 0 else min(32, (os.cpu_count() or 4))
    paths = [str(folder / f) for f, _ in todo]

    # native C++ fast path (OpenMP JPEG decode + bilinear resize, RGB)
    decoded = None
    decoded_stack = None  # pre-stacked [N, R, R, 3] when all decodes succeed
    if channel_order == "rgb" and paths:
        from ..native import native_bulk_decode_resize

        # prescale: DCT-domain scaled decode down to >= 2x the target size
        # (the remaining >=2x is bilinear). Sources much larger than the
        # target decode several times faster; output differs from the
        # full-resolution decode only in detail already discarded by the
        # downsample (tests bound the difference). 2x keeps a quality
        # margin for the on-device random-crop augmentations downstream.
        native_out = native_bulk_decode_resize(
            paths, resize_dim, workers,
            prescale_min=2 * resize_dim if prescale else 0)
        if native_out is not None:
            arr, ok = native_out
            # views, not copies: np.stack below would transiently double
            # peak RAM for the all-success case, so reuse arr directly
            decoded = [arr[i] if ok[i] else None for i in range(len(paths))]
            decoded_stack = arr if ok.all() else None
    if decoded is None:
        with ThreadPoolExecutor(max_workers=workers) as pool:
            decoded = list(pool.map(
                lambda p: _decode_resize(p, resize_dim, channel_order), paths))

    images, labels, l2_labels, poly_labels = [], [], [], []
    plot_word_labels, poly_word_labels = [], []
    file_names, plot_idx = [], []
    for (f, rec), img in zip(todo, decoded):
        if img is None:
            print(f"Warning: Could not read image {f}")
            continue
        images.append(img)
        labels.append(rec.plot_label)
        l2_labels.append(convert_to_coarse_label(rec.plot_word_label))
        poly_labels.append(rec.poly_label if rec.poly_label is not None else -1)
        plot_word_labels.append(rec.plot_word_label)
        poly_word_labels.append(rec.poly_word_label)
        file_names.append(f)
        plot_idx.append(rec.plot_id)

    n = len(images)
    if decoded_stack is not None and n == len(decoded_stack):
        images_arr = decoded_stack  # already one contiguous array
    elif n:
        images_arr = np.stack(images, 0)
    else:
        images_arr = np.zeros((0, resize_dim, resize_dim, 3), np.uint8)
    return ImageArrayDataset(
        images=images_arr,
        labels=np.asarray(labels, np.int64),
        l2_labels=np.asarray(l2_labels, np.int64),
        poly_labels=np.asarray(poly_labels, np.int64),
        plot_word_labels=plot_word_labels,
        poly_word_labels=poly_word_labels,
        file_names=file_names,
        plot_idx=plot_idx,
        image_sources=[str(folder)] * n,
    )


def load_folders(
    folder_paths: Sequence[str],
    index_file_names: Sequence[str],
    resize_dim: int,
    channel_order: str = "rgb",
    num_workers: int = 0,
    cache_dir: Optional[str] = None,
    verbose: bool = False,
    prescale: bool = True,
) -> ImageArrayDataset:
    """Load + merge several folders; optional decoded-array disk cache."""
    if len(folder_paths) != len(index_file_names):
        raise ValueError("folder_paths and index_file_names length mismatch")

    if prescale:
        # a stale native binary without the v2 entry point would decode at
        # full resolution; fold that into the EFFECTIVE setting so the
        # cache key below always matches the pixels actually produced
        from ..native import native_prescale_supported

        prescale = native_prescale_supported()
    # the decode-rule version the LIBRARY reports (not which symbols
    # exist): a stale .so with the v2 entry point but the pre-r3
    # m-selection rule produces different pixels and must not share a
    # cache key with current builds (ADVICE r3)
    from ..native import native_decode_rule_version

    decode_rule = native_decode_rule_version() if prescale else 0

    if cache_dir is not None:
        # the key must change when the DATASET changes, not just its
        # paths: include every folder's image listing and each index
        # CSV's (size, mtime) so edits invalidate the cache
        content = []
        for folder, idx_name in zip(folder_paths, index_file_names):
            fp = Path(folder)
            content.append(sorted(
                f.name for f in fp.iterdir()
                if f.suffix.lower() in (".jpg", ".jpeg", ".png", ".bmp"))
                if fp.is_dir() else [])
            ip = fp / idx_name
            st = ip.stat() if ip.is_file() else None
            content.append([st.st_size, st.st_mtime_ns] if st else None)
        # the decode-rule version keys the prescale pixels: rule 2 is the
        # r3 SIMD-fast m selection; a pre-version .so keys as rule 1 and
        # cannot reuse rule-2 caches (or vice versa)
        key = hashlib.sha1(json.dumps(
            [list(map(str, folder_paths)), list(index_file_names),
             resize_dim, channel_order,
             f"prescale_rule{decode_rule}" if prescale else False,
             content]).encode()
        ).hexdigest()[:16]
        cpath = Path(cache_dir) / f"bulk_{key}"
        if (cpath / "images.npy").is_file():
            return _load_cache(cpath)

    ds: Optional[ImageArrayDataset] = None
    for folder, idx_name in zip(folder_paths, index_file_names):
        part = load_folder(folder, idx_name, resize_dim, channel_order,
                           num_workers, verbose, prescale=prescale)
        ds = part if ds is None else ds.concat(part)
    assert ds is not None

    if cache_dir is not None:
        _save_cache(cpath, ds)
    return ds


def _save_cache(cpath: Path, ds: ImageArrayDataset) -> None:
    cpath.mkdir(parents=True, exist_ok=True)
    np.save(cpath / "images.npy", ds.images)
    np.save(cpath / "labels.npy", ds.labels)
    np.save(cpath / "l2_labels.npy", ds.l2_labels)
    np.save(cpath / "poly_labels.npy", ds.poly_labels)
    meta = {
        "plot_word_labels": ds.plot_word_labels,
        "poly_word_labels": ds.poly_word_labels,
        "file_names": ds.file_names,
        # keep native int/str types (json round-trips both) so cached
        # and fresh runs return identical values
        "plot_idx": [p if isinstance(p, (int, str)) else str(p)
                     for p in (int(p) if isinstance(p, np.integer) else p
                               for p in ds.plot_idx)],
        "image_sources": ds.image_sources,
    }
    (cpath / "meta.json").write_text(json.dumps(meta))


def _load_cache(cpath: Path) -> ImageArrayDataset:
    meta = json.loads((cpath / "meta.json").read_text())
    return ImageArrayDataset(
        images=np.load(cpath / "images.npy", mmap_mode="r"),
        labels=np.load(cpath / "labels.npy"),
        l2_labels=np.load(cpath / "l2_labels.npy"),
        poly_labels=np.load(cpath / "poly_labels.npy"),
        plot_word_labels=meta["plot_word_labels"],
        poly_word_labels=meta["poly_word_labels"],
        file_names=meta["file_names"],
        plot_idx=meta["plot_idx"],
        image_sources=meta["image_sources"],
    )
