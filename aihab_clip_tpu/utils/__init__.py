from .checkpointing import (
    checkpoint_path,
    latest_checkpoint,
    load_checkpoint,
    load_projector,
    save_checkpoint,
    wait_for_async_saves,
    save_projector,
)
from .logging import RunLogger
from .profiling import StepTimer, annotate, device_memory_stats, trace

__all__ = [
    "RunLogger",
    "honor_jax_platforms_env",
    "StepTimer",
    "annotate",
    "checkpoint_path",
    "device_memory_stats",
    "latest_checkpoint",
    "load_checkpoint",
    "load_projector",
    "save_checkpoint",
    "wait_for_async_saves",
    "save_projector",
    "trace",
]


def honor_jax_platforms_env() -> None:
    """Make the JAX_PLATFORMS env var authoritative for CLI runs.

    Some environments pre-register a backend from sitecustomize, which
    silently overrides the env var; the explicit config update wins
    (DEV_NOTES.md "TPU notes")."""
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
