"""Multi-host (DCN) scale-out helpers.

The single-controller JAX model extends to multi-host SPMD: every process
runs the same program, ``jax.distributed.initialize`` wires the DCN
coordination plane, and the global mesh spans all hosts — collectives ride
ICI within a slice and DCN across slices.  The data pipeline shards the
*sample index space* per process (each host bulk-loads only its shard) and
``jax.make_array_from_process_local_data`` assembles global batches.

This module is exercised in single-process mode in tests; on real multi-
host pods it is driven by the standard TPU runtime env vars.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from .mesh import DATA_AXIS, make_mesh


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize the multi-process runtime (no-op when single-process)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def global_mesh(model_parallel: int = 1):
    """Mesh over ALL processes' devices (jax.devices() is global)."""
    return make_mesh(jax.devices(), model_parallel=model_parallel)


def process_shard_indices(n: int, seed: int = 0,
                          process_index: Optional[int] = None,
                          process_count: Optional[int] = None,
                          even: bool = False) -> np.ndarray:
    """Deterministic per-process shard of the sample index space.

    Every process computes the same permutation (seeded) and takes its
    contiguous slice, so hosts load disjoint data without coordination.

    Default shards are UNEVEN when ``process_count`` does not divide ``n``
    (the last process takes the remainder) — fine for independent
    per-host work such as sharded cache writing, but a lockstep SPMD
    consumer that batches its local shard would dispatch a different step
    count per host and hang the pod on the first collective.  Pass
    ``even=True`` for that case: every process gets exactly
    ceil(n / process_count) samples, the short shards padded by wrapping
    into the front of the permutation (duplicates across processes, never
    within one process)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    order = np.random.RandomState(seed).permutation(n)
    if even:
        per = -(-n // pc)  # ceil
        idx = (np.arange(pi * per, (pi + 1) * per) % n)
        return np.sort(order[idx])
    per = n // pc
    start = pi * per
    end = start + per if pi < pc - 1 else n
    return np.sort(order[start:end])


def make_global_batch(mesh, *host_arrays):
    """Assemble process-local batch shards into global sharded arrays."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    out = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in host_arrays)
    return out if len(out) > 1 else out[0]
