"""Cache array storage backends.

Two implementations behind one small interface:

* ``LocalNpyStore`` — raw ``.npy`` files on a local filesystem (mmap-able
  zero-copy reads; this is what the feature-cache GB/s north-star
  measures).
* ``TensorStoreStore`` — tensorstore zarr arrays under any kvstore URI
  (``gs://bucket/...``, ``file://...``, ``s3://...``), giving the cache
  tree a cloud-storage root with the exact same layout.  ``file://`` URIs
  exercise the identical code path in tests; swap in ``gs://`` on a pod.

``open_store(root)`` picks the backend: anything containing ``://`` is a
tensorstore URI, everything else a local directory.  The reference has no
remote-storage story at all (``torch.save`` to local paths,
`/root/reference/aihab_utils/feature_cache.py:152-153`).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import List, Union


_MADV_WILLNEED = 2


def _fast_load_npy(path: Path):
    """Read a ``.npy`` into a fresh array via mmap + readahead + copy.

    ``np.load``'s fread path measures ~0.44 GB/s cold on this box's
    virtio disk.  Mapping the file, telling the kernel the whole range is
    needed (``MADV_WILLNEED`` starts async readahead of the full file),
    and then copying sequentially lets the copy chase the readahead:
    ~2.2 GB/s cold / ~4 GB/s warm — measured best of the alternatives
    tried (threaded chunked ``preadv``: 1.3-1.6 cold; plain serial
    ``readinto``: 0.44 cold) — BENCHMARKS.md "Feature-cache IO".
    Falls back to ``np.load`` for anything non-plain (pickle, fortran).
    """
    import numpy as np

    try:
        arr = np.load(path, mmap_mode="r")
    except ValueError:  # pickled / non-plain payloads cannot be mmap'd
        return np.load(path, allow_pickle=False)
    try:
        arr._mmap.madvise(_MADV_WILLNEED)
    except (AttributeError, OSError):
        pass
    return np.array(arr)


class LocalNpyStore:
    """Arrays as ``<root>/<name>.npy``; JSON as plain files."""

    def __init__(self, root: Union[str, Path]):
        self.root = Path(root)

    def ensure(self) -> None:
        self.root.mkdir(parents=True, exist_ok=True)

    def save(self, name: str, arr) -> str:
        import numpy as np

        self.ensure()
        path = self.root / f"{name}.npy"
        np.save(path, arr)
        return str(path)

    def load(self, name: str, mmap: bool = False):
        import numpy as np

        path = self.root / f"{name}.npy"
        if not mmap:
            return _fast_load_npy(path)
        arr = np.load(path, mmap_mode="r")
        try:
            # async readahead: later page touches (device_put, np ops)
            # overlap with IO instead of faulting page by page
            arr._mmap.madvise(2)  # MADV_WILLNEED
        except (AttributeError, OSError):
            pass
        return arr

    def prefetch(self, name: str) -> None:
        """Hint the kernel to start reading the array file (non-blocking);
        a following ``load`` overlaps its work with the IO."""
        path = self.root / f"{name}.npy"
        try:
            fd = os.open(str(path), os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_WILLNEED)
            finally:
                os.close(fd)
        except (AttributeError, OSError):
            pass

    def exists(self, name: str) -> bool:
        return (self.root / f"{name}.npy").is_file()

    def list_arrays(self, prefix: str) -> List[str]:
        return sorted(p.stem for p in self.root.glob(f"{prefix}*.npy"))

    def write_text(self, name: str, text: str) -> None:
        self.ensure()
        (self.root / name).write_text(text)

    def read_text(self, name: str) -> str:
        return (self.root / name).read_text()

    def write_json(self, name: str, obj) -> None:
        self.write_text(name, json.dumps(obj, indent=2))

    def read_json(self, name: str):
        return json.loads(self.read_text(name))


class TensorStoreStore:
    """Arrays as zarr under ``<root_uri>/<name>/``; JSON via the kvstore."""

    def prefetch(self, name: str) -> None:
        """No-op: tensorstore manages its own read concurrency."""

    def __init__(self, root_uri: str):
        self.root = root_uri if root_uri.endswith("/") else root_uri + "/"

    def ensure(self) -> None:  # kvstores have no directories
        pass

    def _spec(self, name: str) -> dict:
        return {"driver": "zarr", "kvstore": f"{self.root}{name}/"}

    def save(self, name: str, arr) -> str:
        import numpy as np
        import tensorstore as ts

        arr = np.asarray(arr)
        t = ts.open(self._spec(name), create=True, delete_existing=True,
                    dtype=arr.dtype, shape=arr.shape).result()
        t[...] = arr
        return f"{self.root}{name}/"

    def load(self, name: str, mmap: bool = False):
        import tensorstore as ts

        t = ts.open(self._spec(name), open=True).result()
        return t[...].read().result()

    def exists(self, name: str) -> bool:
        import tensorstore as ts

        try:
            ts.open(self._spec(name), open=True).result()
            return True
        except (FileNotFoundError, KeyError) as e:  # genuinely absent
            del e
            return False
        except Exception as e:
            # ONLY absence may map to False: a transient network/auth
            # error on a remote root must propagate, or the runner would
            # either abort with "cache not found" or re-encode and
            # OVERWRITE an existing cache (save uses delete_existing)
            msg = str(e).upper()
            if "NOT_FOUND" in msg or "NOT FOUND" in msg:
                return False
            raise

    def list_arrays(self, prefix: str) -> List[str]:
        import tensorstore as ts

        kv = ts.KvStore.open(self.root).result()
        names = set()
        for key in kv.list().result():
            key = key.decode() if isinstance(key, bytes) else key
            if key.startswith(prefix) and key.endswith("/.zarray"):
                names.add(key[: -len("/.zarray")])
        return sorted(names)

    def write_text(self, name: str, text: str) -> None:
        import tensorstore as ts

        kv = ts.KvStore.open(self.root).result()
        kv.write(name, text.encode()).result()

    def read_text(self, name: str) -> str:
        import tensorstore as ts

        kv = ts.KvStore.open(self.root).result()
        return kv.read(name).result().value.decode()

    def write_json(self, name: str, obj) -> None:
        self.write_text(name, json.dumps(obj, indent=2))

    def read_json(self, name: str):
        return json.loads(self.read_text(name))


Store = Union[LocalNpyStore, TensorStoreStore]


def is_remote_root(root: Union[str, Path]) -> bool:
    return "://" in str(root)


def open_store(root: Union[str, Path]) -> Store:
    if is_remote_root(root):
        return TensorStoreStore(str(root))
    return LocalNpyStore(root)


def join_cache_path(root: Union[str, Path], *parts: str):
    """Path joining that preserves URI roots (``Path`` mangles ``//``)."""
    if is_remote_root(root):
        base = str(root).rstrip("/")
        return "/".join([base, *parts])
    return Path(root).joinpath(*parts)
