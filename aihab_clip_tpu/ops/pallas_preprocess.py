"""Pallas TPU kernel: fused uint8 -> CLIP-normalized bf16 conversion.

The final stage of the on-device preprocessing path ((x/255 - mean)/std +
cast) is pure HBM-bandwidth work.  This kernel performs it in one read /
one write over a channel-last-flattened layout:

  * the [B, H, W, 3] batch is viewed as [rows, lanes] with lanes a multiple
    of 3*128 so each 128-lane vector register holds a fixed channel phase;
  * per-channel mean/std are expanded to a [1, lanes] row (phase pattern
    precomputed host-side) and broadcast down the rows inside the kernel —
    no per-element channel indexing on the VPU;
  * grid over row-tiles; uint8 loads, bf16 stores.

``normalize_u8`` falls back to the pure-jnp path automatically off-TPU or
for shapes that do not tile (the jnp path is used in tests via
``interpret=True`` as well).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..backend import dispatch_backend

from .preprocess import CLIP_MEAN, CLIP_STD

_LANES = 384  # 3 channels * 128 lanes -> whole RGB pixels per vector row
_ROWS = 256   # row tile


def _phase_tables(mean, std, lanes: int) -> Tuple[np.ndarray, np.ndarray]:
    """Per-lane scale/shift rows for the RGB phase pattern:
    out = in * scale + shift with scale = 1/(255*std_c), shift = -mean_c/std_c."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    ch = np.arange(lanes) % 3
    scale = (1.0 / (255.0 * std))[ch]
    shift = (-mean / std)[ch]
    return scale.astype(np.float32), shift.astype(np.float32)


def _normalize_kernel(x_ref, scale_ref, shift_ref, out_ref):
    # Mosaic can't cast u8 -> f32 directly; widen via int32 first
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    out_ref[:] = (x * scale_ref[:] + shift_ref[:]).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def _normalize_tiled(flat_u8: jax.Array, scale_row: jax.Array,
                     shift_row: jax.Array, out_dtype=jnp.bfloat16,
                     interpret: bool = False) -> jax.Array:
    rows, lanes = flat_u8.shape
    grid = (pl.cdiv(rows, _ROWS),)
    return pl.pallas_call(
        _normalize_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, lanes), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_ROWS, lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat_u8, scale_row, shift_row)


def normalize_u8_pallas(images_u8: jax.Array, mean=CLIP_MEAN, std=CLIP_STD,
                        dtype=jnp.bfloat16,
                        interpret: bool = False) -> jax.Array:
    """Fused (x/255 - mean)/std for uint8 NHWC batches via Pallas.

    Requires the flattened pixel count per image row-group to tile into
    lanes of 384; arbitrary shapes are padded up and sliced back."""
    if images_u8.dtype != jnp.uint8:
        raise ValueError("normalize_u8_pallas expects uint8 input")
    b, h, w, c = images_u8.shape
    if c != 3:
        raise ValueError("expects 3-channel input")

    total = b * h * w * c
    rows = pl.cdiv(total, _LANES)
    pad = rows * _LANES - total
    flat = images_u8.reshape(-1)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.uint8)])
    flat = flat.reshape(rows, _LANES)

    scale_np, shift_np = _phase_tables(mean, std, _LANES)
    out = _normalize_tiled(flat, jnp.asarray(scale_np)[None, :],
                           jnp.asarray(shift_np)[None, :], dtype, interpret)
    out = out.reshape(-1)
    if pad:
        out = out[:total]
    return out.reshape(b, h, w, c)


def normalize_u8(images_u8: jax.Array, mean=CLIP_MEAN, std=CLIP_STD,
                 dtype=jnp.bfloat16, use_pallas: bool = False) -> jax.Array:
    """Fused u8 normalize.

    Measured on TPU v5e (batch 256 @224): XLA fully fuses the jnp
    formulation into neighboring ops (~0 ms standalone) while the Pallas
    kernel costs ~10 ms as a separate pass — so the jnp path is the
    default and the kernel is kept as an explicit opt-in (useful when the
    surrounding graph prevents fusion)."""
    if use_pallas and dispatch_backend() == "tpu":
        # no silent fallback: the caller explicitly opted into the kernel,
        # and swallowing a Mosaic/shape regression here would make tests
        # pass (and benchmarks measure) the jnp path while claiming the
        # kernel ran
        return normalize_u8_pallas(images_u8, mean, std, dtype)
    from .preprocess import normalize

    return normalize(images_u8, mean, std, dtype)
