"""ctypes bindings for the native (C++) runtime components.

Two shared libraries under ``native/`` (built with ``make -C native``):
  * ``libclip_bpe.so``       — fast byte-level BPE encoder (ASCII fast path;
                               non-ASCII falls back to the Python tokenizer)
  * ``libimage_pipeline.so`` — OpenMP-parallel JPEG decode + bilinear
                               resize for bulk dataset loading

Everything degrades gracefully: if a library is missing or fails to build,
the pure-Python paths are used and ``available()`` reports False.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import zlib
from functools import lru_cache
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


def _try_build() -> None:
    try:
        subprocess.run(["make", "-C", str(NATIVE_DIR)], capture_output=True,
                       timeout=120, check=False)
    except Exception:
        pass


@lru_cache()
def _load_lib(name: str) -> Optional[ctypes.CDLL]:
    path = NATIVE_DIR / name
    # make is incremental (rebuilds only when a source is newer than its
    # .so), so always running it keeps a checked-out stale binary from
    # shadowing newer sources; one no-op make per process is ~20 ms.
    _try_build()
    if not path.is_file():
        return None
    try:
        return ctypes.CDLL(str(path))
    except OSError:
        return None


# ---------------------------------------------------------------------------
# BPE tokenizer
# ---------------------------------------------------------------------------


@lru_cache()
def _bpe_lib() -> Optional[ctypes.CDLL]:
    lib = _load_lib("libclip_bpe.so")
    if lib is None:
        return None
    lib.clip_bpe_init.restype = ctypes.c_int
    lib.clip_bpe_init.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    lib.clip_bpe_encode.restype = ctypes.c_int
    lib.clip_bpe_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]

    from .tokenizer.bpe import default_merges_path

    blob = zlib.decompress(Path(default_merges_path()).read_bytes())
    vocab = lib.clip_bpe_init(blob, len(blob))
    if vocab != 49408:
        return None
    return lib


def native_bpe_available() -> bool:
    return _bpe_lib() is not None


def native_bpe_encode(cleaned_text: str,
                      max_tokens: int = 1024) -> Optional[List[int]]:
    """Encode an already-cleaned+lowercased string.  Returns None when the
    native path cannot handle it (non-ASCII etc.) — caller falls back."""
    lib = _bpe_lib()
    if lib is None:
        return None
    raw = cleaned_text.encode("utf-8")
    buf = (ctypes.c_int32 * max_tokens)()
    n = lib.clip_bpe_encode(raw, len(raw), buf, max_tokens)
    if n == -2:  # capacity; retry bigger once
        buf = (ctypes.c_int32 * (max_tokens * 8))()
        n = lib.clip_bpe_encode(raw, len(raw), buf, max_tokens * 8)
    if n < 0:
        return None
    return list(buf[:n])


# ---------------------------------------------------------------------------
# Bulk image decode + resize
# ---------------------------------------------------------------------------


@lru_cache()
def _img_lib() -> Optional[ctypes.CDLL]:
    lib = _load_lib("libimage_pipeline.so")
    if lib is None:
        return None
    lib.bulk_decode_resize.restype = ctypes.c_int
    lib.bulk_decode_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int]
    try:  # v2 adds prescale_min (DCT-domain scaled decode); absent in
        lib.bulk_decode_resize2.restype = ctypes.c_int  # stale builds
        lib.bulk_decode_resize2.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
    except AttributeError:
        pass
    try:  # memory-source entries (serving hot path); absent in stale builds
        lib.decode_resize_mem.restype = ctypes.c_int
        lib.decode_resize_mem.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.bulk_decode_resize_mem.restype = ctypes.c_int
        lib.bulk_decode_resize_mem.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
    except AttributeError:
        pass
    return lib


def native_image_available() -> bool:
    return _img_lib() is not None


def native_prescale_supported() -> bool:
    """True when the loaded library has the v2 (prescale-capable) entry
    point. Callers that key caches on the prescale setting must check this
    so a stale binary can't write full-resolution pixels under a
    prescale=True cache key."""
    lib = _img_lib()
    return lib is not None and hasattr(lib, "bulk_decode_resize2")


def native_decode_rule_version() -> int:
    """Decode-rule/ABI version reported by the loaded library itself
    (``image_pipeline_abi_version``), so Python-side cache keys track the
    binary's ACTUAL decode behavior — not just which symbols exist.  A
    stale pre-version .so (has ``bulk_decode_resize2`` but not the version
    export, i.e. the pre-SIMD-rule build) reports 1; no library reports 0."""
    lib = _img_lib()
    if lib is None:
        return 0
    if not hasattr(lib, "image_pipeline_abi_version"):
        return 1
    lib.image_pipeline_abi_version.restype = ctypes.c_int
    lib.image_pipeline_abi_version.argtypes = []
    return int(lib.image_pipeline_abi_version())


def native_bulk_decode_resize(
    paths: List[str], resize_dim: int, num_threads: int = 0,
    prescale_min: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode+resize JPEGs -> ([N, R, R, 3] uint8 RGB, ok mask [N] bool).
    Returns None if the native library is unavailable.

    ``prescale_min > 0`` decodes each JPEG at the smallest libjpeg m/8
    scale that keeps both dimensions >= prescale_min (DCT-domain scaling —
    large sources decode several times faster) before the bilinear resize;
    0 always decodes at full resolution."""
    lib = _img_lib()
    if lib is None or not paths:
        return None
    # only JPEGs are supported natively
    if not all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
        return None
    blob = "\n".join(paths).encode("utf-8")
    n = len(paths)
    out = np.empty((n, resize_dim, resize_dim, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    # cap at the core count: oversubscribed OpenMP threads spin-wait and
    # run SLOWER than serial (measured 2x worse at 8 threads on 1 core)
    cores = os.cpu_count() or 4
    threads = min(num_threads, cores) if num_threads > 0 else min(32, cores)
    out_p = out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    ok_p = ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    if hasattr(lib, "bulk_decode_resize2"):
        lib.bulk_decode_resize2(blob, len(blob), n, resize_dim,
                                int(prescale_min), out_p, ok_p, threads)
    else:  # stale binary without the v2 symbol: full-resolution decode
        lib.bulk_decode_resize(blob, len(blob), n, resize_dim, out_p, ok_p,
                               threads)
    return out, ok.astype(bool)


_JPEG_MAGIC = b"\xff\xd8\xff"


def native_mem_decode_available() -> bool:
    lib = _img_lib()
    return lib is not None and hasattr(lib, "decode_resize_mem")


def native_decode_resize_mem(data: bytes, resize_dim: int,
                             prescale_min: int = 0) -> Optional[np.ndarray]:
    """Decode ONE in-memory JPEG -> [R, R, 3] uint8 RGB, or None when the
    native path is unavailable, the bytes are not a JPEG, or the decode
    fails (callers fall back to cv2 — undecodable vs unsupported is the
    caller's distinction to make, both return None here)."""
    lib = _img_lib()
    if (lib is None or not hasattr(lib, "decode_resize_mem")
            or not data.startswith(_JPEG_MAGIC)):
        return None
    out = np.empty((resize_dim, resize_dim, 3), np.uint8)
    rc = lib.decode_resize_mem(
        data, len(data), resize_dim, int(prescale_min),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 1 else None


def native_bulk_decode_resize_mem(
    blobs: List[bytes], resize_dim: int, num_threads: int = 0,
    prescale_min: int = 0,
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Decode+resize a list of in-memory JPEGs in one OpenMP call ->
    ([N, R, R, 3] uint8 RGB, ok mask [N] bool).  Returns None when the
    native path is unavailable or ANY blob is not JPEG-magic-framed
    (mixed-format requests fall back to the per-blob path)."""
    lib = _img_lib()
    if (lib is None or not hasattr(lib, "bulk_decode_resize_mem")
            or not blobs
            or not all(b.startswith(_JPEG_MAGIC) for b in blobs)):
        return None
    n = len(blobs)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(b) for b in blobs], out=offsets[1:])
    blob = b"".join(blobs)
    out = np.empty((n, resize_dim, resize_dim, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    cores = os.cpu_count() or 4
    threads = min(num_threads, cores) if num_threads > 0 else min(32, cores)
    lib.bulk_decode_resize_mem(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        resize_dim, int(prescale_min),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), threads)
    return out, ok.astype(bool)
