"""Checkpoint save / load / resume (Orbax).

Extends the reference's save-only checkpointing
(`/root/reference/aihab_utils/checkpointing.py`) with actual resume:

  * path scheme parity: ``<save_model_dir>/<backbone>_<epoch>_<YYYYMMDD_HH>``
  * payload parity: model params, optimizer state, schedule position,
    epoch, timestamp, config, backend, model name
  * ``load_checkpoint`` restores into provided abstract targets (Orbax
    needs structure); ``latest_checkpoint`` finds the newest run for a
    backbone so training can resume (the reference defines
    ``finetune.checkpoint`` / ``eval_only`` config stubs but never wires
    them — here they work).
"""

from __future__ import annotations

import json
import re
from datetime import datetime
from pathlib import Path
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

from ..cache.feature_cache import resolve_model_name


def _resolve_dir(root: Path, path: str) -> Path:
    out = Path(path)
    return out if out.is_absolute() else root / out


def checkpoint_path(cfg, epoch: int, timestamp: Optional[str] = None) -> Path:
    ft_cfg = cfg.get("finetune", {})
    root = Path(cfg.get("root_path", "./"))
    ckpt_dir = _resolve_dir(root, ft_cfg.get("save_model_dir", "model_ckpt"))
    # shared resolution: the checkpoint tree and the cache trees must
    # agree on a run's model name (the copies had diverging defaults)
    name = resolve_model_name(cfg)
    ts = timestamp or datetime.now().strftime("%Y%m%d_%H")
    return ckpt_dir / f"{name}_{int(epoch)}_{ts}".replace("/", "_")


# one process-wide async checkpointer (it owns a worker thread); created
# lazily so import stays cheap and sync-only runs never spawn it
_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_checkpointer() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_async_saves() -> None:
    """Block until every in-flight async checkpoint write has committed.
    Call at end of training (the runner does) — a process exit before the
    background write commits leaves no 'state' dir (Orbax renames on
    commit), which ``load_checkpoint`` rejects cleanly."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    cfg,
    params: Dict,
    opt_state: Any = None,
    epoch: int = 0,
    extra_meta: Optional[Dict] = None,
    async_save: bool = False,
) -> Path:
    """``async_save``: return as soon as the device->host copy is done
    and write to disk in the background (Orbax AsyncCheckpointer) — the
    train loop is free to donate/update its buffers immediately, and a
    multi-GB SO400M payload no longer stalls the step loop on disk IO.
    Callers must ``wait_for_async_saves()`` before relying on the file."""
    ts = datetime.now().strftime("%Y%m%d_%H")
    path = checkpoint_path(cfg, epoch, ts).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)

    payload = {"params": params}
    if opt_state is not None and bool(cfg.get("finetune", {}).get(
            "save_optimizer", True)):
        payload["opt_state"] = opt_state
    if async_save:
        ckptr = _async_checkpointer()
        ckptr.save(path / "state", args=ocp.args.StandardSave(payload))
    else:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path / "state", payload)
        ckptr.wait_until_finished()

    meta = {
        "epoch": int(epoch),
        "timestamp": ts,
        "clip_backend": cfg.get("clip_backend", "openclip"),
        "open_clip_model": cfg.get("open_clip_model", None),
        "backbone": cfg.get("backbone", None),
        "cfg": _cfg_to_jsonable(cfg),
        "has_opt_state": "opt_state" in payload,
    }
    if extra_meta:
        meta.update(extra_meta)
    (path / "meta.json").write_text(json.dumps(meta, indent=2, default=str))
    return path


def _cfg_to_jsonable(cfg) -> Dict:
    try:
        return json.loads(json.dumps(
            cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg),
            default=str))
    except Exception:
        return {}


def load_checkpoint(
    path: Path,
    abstract_params: Dict,
    abstract_opt_state: Any = None,
) -> Dict[str, Any]:
    """Restore a checkpoint. ``abstract_*`` provide target structure (use
    the freshly-initialized pytrees)."""
    path = Path(path).resolve()
    meta = json.loads((path / "meta.json").read_text())
    ckptr = ocp.StandardCheckpointer()
    if meta.get("has_opt_state") and abstract_opt_state is None:
        # opt state on disk but caller only wants params: restore with the
        # on-disk structure, then drop the optimizer state
        restored = dict(ckptr.restore(path / "state"))
    else:
        target = {"params": abstract_params}
        if meta.get("has_opt_state") and abstract_opt_state is not None:
            target["opt_state"] = abstract_opt_state
        restored = dict(ckptr.restore(path / "state", target))
    restored["meta"] = meta
    return restored


def latest_checkpoint(cfg) -> Optional[Path]:
    """Newest checkpoint directory for the configured backbone, or None."""
    ft_cfg = cfg.get("finetune", {})
    root = Path(cfg.get("root_path", "./"))
    ckpt_dir = _resolve_dir(root, ft_cfg.get("save_model_dir", "model_ckpt"))
    if not ckpt_dir.is_dir():
        return None
    prefix = resolve_model_name(cfg)
    # prefix + "_" (the path scheme's separator): a bare prefix match lets
    # "ViT-B-16-SigLIP2..." shadow "ViT-B-16".  Requiring the committed
    # "state" dir (Orbax renames on commit) skips checkpoints whose async
    # write never finished — meta.json alone is written eagerly.
    candidates = [p for p in ckpt_dir.iterdir()
                  if p.is_dir() and p.name.startswith(prefix + "_")
                  and (p / "meta.json").is_file()
                  and (p / "state").is_dir()]
    if not candidates:
        return None

    def sort_key(p: Path):
        m = re.search(r"_(\d+)_(\d{8}_\d{2})$", p.name)
        return (m.group(2), int(m.group(1))) if m else ("", 0)

    return max(candidates, key=sort_key)


def save_projector(path: Path, weight, bias=None, meta: Optional[Dict] = None):
    """Persist a ProLIP projector (small head -> plain npz + json)."""
    import numpy as np

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {"weight": np.asarray(weight)}
    if bias is not None:
        arrays["bias"] = np.asarray(bias)
    np.savez(path, **arrays)
    if meta:
        path.with_suffix(".json").write_text(json.dumps(meta, indent=2,
                                                        default=str))


def load_projector(path: Path):
    import numpy as np

    with np.load(path) as data:
        weight = data["weight"]
        bias = data["bias"] if "bias" in data.files else None
    return weight, bias
