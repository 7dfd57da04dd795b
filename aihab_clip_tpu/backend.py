"""Backend dispatch helper.

Every fast-path dispatch gate ("use the Pallas kernel on TPU") must
agree with where the traced computation will actually run.  A bare
``jax.default_backend()`` is wrong under ``with jax.default_device(cpu)``
— the context changes the placement of new computations but not the
highest-priority platform — and a Pallas kernel lowered for CPU raises
"Only interpret mode is supported on CPU backend".  (Observed: host-side
init of a model too large for HBM while a TPU is the default backend.)
"""

from __future__ import annotations

import jax


def dispatch_backend() -> str:
    """The platform newly-traced computations will run on: the
    ``jax.default_device`` override's platform when one is active, else
    the default backend."""
    dev = jax.config.jax_default_device
    if dev is not None:
        try:
            return dev.platform
        except AttributeError:  # e.g. a string spec
            return str(dev)
    return jax.default_backend()


def on_tpu() -> bool:
    return dispatch_backend() == "tpu"
