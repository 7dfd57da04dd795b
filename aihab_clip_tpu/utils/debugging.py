"""Numerical-debugging helpers (the reference has no sanitizers;
SURVEY.md §5 asks the TPU build to supply them).

  * ``nan_debugging()``      — context manager flipping jax_debug_nans so
                               the first NaN-producing primitive raises
                               with a traceback instead of propagating.
  * ``assert_finite(tree)``  — host-side check that every leaf of a pytree
                               (params, grads, metrics) is finite; names
                               the offending paths.
  * ``finite_or_raise(x)``   — in-jit checkify-style guard via
                               ``jax.debug.callback`` (cheap; one scalar
                               reduction per call site).
"""

from __future__ import annotations

import contextlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_debugging(enabled: bool = True):
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", bool(enabled))
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_finite(tree: Any, name: str = "pytree") -> None:
    """Raise with the offending leaf paths if any value is non-finite."""
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{jax.tree_util.keystr(path)} ({n_bad} non-finite)")
    if bad:
        raise FloatingPointError(
            f"non-finite values in {name}: " + "; ".join(bad))


def finite_or_raise(x: jax.Array, name: str = "value") -> jax.Array:
    """In-jit guard: host callback raises when the array has NaN/Inf.
    Returns x unchanged (insert into the dataflow to keep it live)."""

    def _check(ok):
        if not bool(ok):
            raise FloatingPointError(f"non-finite values in {name}")

    ok = jnp.isfinite(x.astype(jnp.float32)).all()
    jax.debug.callback(_check, ok)
    return x
