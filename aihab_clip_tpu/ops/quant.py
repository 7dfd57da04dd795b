"""int8 quantized matmul primitives for the serving/encode path.

The v5e MXU runs int8xint8->int32 at ~2.1x the bf16 rate (measured:
414 TFLOP/s vs ~200 at 4096^3 — PERF_NOTES.md), so weight-and-activation
int8 GEMMs buy encode throughput where the tower is GEMM-bound.

Scheme (standard W8A8 dynamic):
  * weights: symmetric per-output-channel int8
    (``scale_w[n] = max|W[:, n]| / 127``), quantized once at load time;
  * activations: symmetric per-row dynamic int8
    (``scale_x[m] = max|x[m, :]| / 127``), quantized in-graph;
  * GEMM accumulates int32; dequant is a rank-1 outer scale
    ``y = acc * (scale_x ⊗ scale_w)`` fused by XLA into the epilogue.

No torch, no external quant libs — pure jnp/lax (the int8 MXU path is
hit via ``preferred_element_type=int32``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: w [K, N] -> (w8 [K, N] int8,
    scale [N] fp32) with w ~= w8 * scale."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    w8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w8, scale


def quantize_activation(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8: x [M, K] -> (x8 int8, scale [M, 1] fp32)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    x8 = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x8, scale


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


def quant_dense(
    x: jax.Array,
    w8: jax.Array,
    w_scale: jax.Array,
    bias: Optional[jax.Array] = None,
    act: Optional[str] = None,
    out_dtype=None,
) -> jax.Array:
    """y = act(dequant(int8(x) @ w8) + bias).

    x [M, K] float; w8 [K, N] int8; w_scale [N] fp32.  The int8 GEMM
    accumulates int32 on the MXU; everything around it is elementwise and
    fuses into the GEMM epilogue.
    """
    out_dtype = out_dtype or x.dtype
    x8, sx = quantize_activation(x)
    acc = jax.lax.dot(x8, w8, preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * w_scale[None, :])
    if bias is not None:
        y = y + jnp.asarray(bias, jnp.float32)[None, :]
    if act == "quick_gelu":
        y = quick_gelu(y)
    elif act == "gelu_tanh":
        y = jax.nn.gelu(y, approximate=True)
    elif act == "gelu":
        y = jax.nn.gelu(y, approximate=False)
    elif act is not None:
        raise ValueError(f"unknown activation '{act}'")
    return y.astype(out_dtype)
