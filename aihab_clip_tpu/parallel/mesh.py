"""Device mesh + sharding helpers.

The reference is strictly single-device (SURVEY.md §2.3); the TPU build
scales with SPMD over a ``jax.sharding.Mesh``:

  * axis ``data``  — batch sharding (DP); gradient all-reduce is inserted
    by the GSPMD partitioner and rides ICI;
  * axis ``model`` — optional tensor parallelism for large towers: attention
    QKV/out and MLP hidden dims are sharded over ``model`` via param-path
    rules (megatron-style column/row split pairs, so each block needs one
    all-reduce of activations, fused by XLA into the matmul schedule).

Pipeline parallelism lives in ``parallel/pipeline.py`` (GPipe schedule
over a 1-D ``stage`` mesh) for towers whose weights outgrow one chip
(ViT-g/bigG class).  SP/EP are intentionally N/A for this model family:
sequences are <= ~1k tokens and there is no MoE (SURVEY.md §5).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def device_grid(devices: Sequence, shape: Tuple[int, ...]) -> np.ndarray:
    """Topology-aware device placement for a mesh of ``shape``.

    ``jax.devices()`` order is not torus-adjacent on real multi-chip
    slices, so a naive reshape can scatter a minor-axis group (the
    per-block TP all-reduces, the pipeline's stage-neighbor ppermute hops)
    across non-neighbor chips.  ``mesh_utils.create_device_mesh`` searches
    the physical topology for an assignment whose minor axis rides ICI
    neighbors; fall back to the plain reshape where no topology info
    exists (CPU/virtual devices, explicit device subsets)."""
    try:
        from jax.experimental import mesh_utils

        return mesh_utils.create_device_mesh(shape, devices=list(devices))
    except Exception:
        return np.asarray(devices).reshape(shape)


def make_mesh(devices: Optional[Sequence] = None,
              model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the given devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = device_grid(devices, (n // model_parallel, model_parallel))
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# ---------------------------------------------------------------------------
# Tensor-parallel param placement rules (path-regex -> PartitionSpec).
# Megatron pairing: column-parallel (shard output dim) for QKV/c_fc,
# row-parallel (shard input dim) for out_proj/c_proj.
# ---------------------------------------------------------------------------

_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*attn/in_proj/kernel$", P(None, MODEL_AXIS)),
    (r".*attn/in_proj/bias$", P(MODEL_AXIS)),
    # SigLIP layout: separate q/k/v projections (each column-parallel —
    # output dim = heads x head_dim, so heads split across the model axis
    # exactly like the fused in_proj)
    (r".*attn/(q_proj|k_proj|v_proj)/kernel$", P(None, MODEL_AXIS)),
    (r".*attn/(q_proj|k_proj|v_proj)/bias$", P(MODEL_AXIS)),
    (r".*attn/out_proj/kernel$", P(MODEL_AXIS, None)),
    (r".*mlp/c_fc/kernel$", P(None, MODEL_AXIS)),
    (r".*mlp/c_fc/bias$", P(MODEL_AXIS)),
    (r".*mlp/c_proj/kernel$", P(MODEL_AXIS, None)),
    (r".*/token_embedding$", P(None, None)),
)


def param_pspec(path: str, tp: bool, fsdp: bool = False,
                shape: Optional[Tuple[int, ...]] = None,
                data_size: int = 1) -> P:
    """PartitionSpec for a '/'-joined param path.

    ``fsdp`` additionally shards the largest still-unsharded dimension
    divisible by the data-axis size over ``data`` (ZeRO-3 style: the
    GSPMD partitioner inserts the forward/backward all-gathers and turns
    the gradient all-reduce into a reduce-scatter; Adam moments inherit
    the param shardings through ``opt.init``, so optimizer memory scales
    down with the data axis too)."""
    spec = P()
    if tp:
        for pattern, s in _TP_RULES:
            if re.match(pattern, path):
                spec = s
                break
    if fsdp and shape is not None and data_size > 1:
        dims = list(spec) + [None] * (len(shape) - len(spec))
        best = None
        for i, d in enumerate(shape):
            if dims[i] is None and d % data_size == 0:
                if best is None or d > shape[best]:
                    best = i
        if best is not None:
            dims[best] = DATA_AXIS
            spec = P(*dims)
    return spec


def param_shardings(mesh: Mesh, params, fsdp: bool = False) -> dict:
    """NamedSharding pytree for a param tree (TP rules active when the
    model axis has more than one device; ``fsdp`` adds data-axis weight
    sharding per ``param_pspec``)."""
    tp = mesh.shape[MODEL_AXIS] > 1
    data_size = mesh.shape[DATA_AXIS]
    flat = _flatten(params)
    specs = {path: NamedSharding(
        mesh, param_pspec(path, tp, fsdp=fsdp,
                          shape=tuple(getattr(leaf, "shape", ())),
                          data_size=data_size))
        for path, leaf in flat.items()}
    return _unflatten(specs)


def _flatten(tree, prefix=()):  # path -> leaf
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out["/".join(prefix)] = tree
    return out


def _unflatten(flat: dict):
    out: dict = {}
    for path, v in flat.items():
        node = out
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def shard_params(mesh: Mesh, params, fsdp: bool = False):
    """Place a param tree on the mesh per the TP (+ optional FSDP) rules
    (replicated when model axis is 1 and fsdp is off)."""
    shardings = param_shardings(mesh, params, fsdp=fsdp)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(mesh: Mesh, *arrays):
    """Place batch arrays with leading-axis data sharding."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]
