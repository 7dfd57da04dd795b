"""Fused linear-layer Pallas kernels: LN-prologue / activation- and
residual-epilogue matmuls.

Measured motivation (PERF_NOTES.md): the ViT tower's non-GEMM time is the
elementwise HBM traffic *between* GEMMs — LayerNorm, QuickGELU, residual
adds each re-read/re-write [B*S, width]-sized activations.  These kernels
fuse that work into the matmul's tile pipeline so normalized/activated
values never round-trip through HBM:

  * ``ln_matmul(x, ls, lb, w, b)``          -> LN(x) @ w + b
  * ``ln_matmul(..., activation='quick_gelu')`` adds the epilogue act
  * ``matmul_residual(x, w, b, res)``       -> x @ w + b + res

Design: when the whole weight matrix fits in VMEM (ViT-B/L class layers:
K x N x 2 bytes <= ~10 MB), the grid runs over M-tiles ONLY and the weight
block index is constant, so Pallas keeps it resident — x, W, and the
output each cross HBM exactly once (an (M, N)-tiled first attempt
re-streamed W once per M-tile: ~700 MB of extra traffic per ViT-B layer,
measured slower than XLA).  Larger layers fall back to an N-blocked grid
with a persistent LN scratch.  fp32 accumulation via
``preferred_element_type``.

All entry points carry a custom VJP that recomputes through the plain XLA
formulation — the kernels serve the inference/encode path; gradients are
the standard ones.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..backend import dispatch_backend

BM = 256
BN = 256


def _quick_gelu_f32(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _act_f32(x, activation: Optional[str]):
    if activation == "quick_gelu":
        return _quick_gelu_f32(x)
    if activation == "gelu_tanh":
        return jax.nn.gelu(x, approximate=True)
    if activation == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if activation == "gelu_poly":
        from .block_kernel import gelu_fast_f32

        return gelu_fast_f32(x)
    if activation is not None:
        raise ValueError(f"unknown activation '{activation}'")
    return x


def _ln_rows(x_f32, scale, bias, eps=1e-5):
    mean = jnp.mean(x_f32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x_f32 - mean), axis=-1, keepdims=True)
    return (x_f32 - mean) * jax.lax.rsqrt(var + eps) * scale + bias


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _ln_matmul_kernel(x_ref, ls_ref, lb_ref, w_ref, b_ref, o_ref,
                      ln_scratch, *, activation: Optional[str],
                      eps: float = 1e-5):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        x = x_ref[:].astype(jnp.float32)
        ln = _ln_rows(x, ls_ref[:].astype(jnp.float32),
                      lb_ref[:].astype(jnp.float32), eps=eps)
        ln_scratch[:] = ln.astype(ln_scratch.dtype)

    out = jnp.dot(ln_scratch[:], w_ref[:],
                  preferred_element_type=jnp.float32)
    out = out + b_ref[:].astype(jnp.float32)
    out = _act_f32(out, activation)
    o_ref[:] = out.astype(o_ref.dtype)


def _matmul_residual_kernel(x_ref, w_ref, b_ref, r_ref, o_ref):
    out = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    out = out + b_ref[:].astype(jnp.float32)
    out = out + r_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _ln_matmul_fulln_kernel(x_ref, ls_ref, lb_ref, w_ref, b_ref, o_ref,
                            *, activation: Optional[str],
                            eps: float = 1e-5):
    """Grid over M only; W resident in VMEM (constant block index)."""
    x = x_ref[:].astype(jnp.float32)
    ln = _ln_rows(x, ls_ref[:].astype(jnp.float32),
                  lb_ref[:].astype(jnp.float32), eps=eps)
    out = jnp.dot(ln.astype(w_ref.dtype), w_ref[:],
                  preferred_element_type=jnp.float32)
    out = out + b_ref[:].astype(jnp.float32)
    out = _act_f32(out, activation)
    o_ref[:] = out.astype(o_ref.dtype)


def _matmul_residual_fulln_kernel(x_ref, w_ref, b_ref, r_ref, o_ref):
    out = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    out = out + b_ref[:].astype(jnp.float32)
    out = out + r_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


# weights larger than this use the N-blocked grid instead of staying
# VMEM-resident
_FULLN_WEIGHT_BYTES = 10 * 1024 * 1024


# ---------------------------------------------------------------------------
# Callers
# ---------------------------------------------------------------------------


def _pad_rows(x, bm):
    m = x.shape[0]
    m_pad = pl.cdiv(m, bm) * bm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    return x, m


def _pad_cols(w, b, bn):
    n = w.shape[1]
    n_pad = pl.cdiv(n, bn) * bn
    if n_pad != n:
        w = jnp.pad(w, ((0, 0), (0, n_pad - n)))
        b = jnp.pad(b, (0, n_pad - n))
    return w, b, n


def _ln_matmul_pallas(x, ln_scale, ln_bias, w, b,
                      activation: Optional[str] = None,
                      eps: float = 1e-5,
                      interpret: bool = False):
    x, m = _pad_rows(x, BM)
    w, b, n = _pad_cols(w, b, 128)
    mp, k = x.shape
    np_ = w.shape[1]

    if k * np_ * x.dtype.itemsize <= _FULLN_WEIGHT_BYTES:
        out = pl.pallas_call(
            partial(_ln_matmul_fulln_kernel, activation=activation, eps=eps),
            out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
            grid=(mp // BM,),
            in_specs=[
                pl.BlockSpec((BM, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, np_), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, np_), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, np_), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * k * np_,
                bytes_accessed=mp * k * 2 + k * np_ * 2 + mp * np_ * 2,
                transcendentals=mp * np_ if activation else 0),
            interpret=interpret,
        )(x, ln_scale.reshape(1, -1), ln_bias.reshape(1, -1), w,
          b.reshape(1, -1))
        return out[:m, :n]

    w, b, _ = _pad_cols(w, b.reshape(-1), BN)
    np_ = w.shape[1]
    out = pl.pallas_call(
        partial(_ln_matmul_kernel, activation=activation, eps=eps),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        grid=(mp // BM, np_ // BN),
        in_specs=[
            pl.BlockSpec((BM, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BM, k), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * np_,
            bytes_accessed=mp * k * 2 + k * np_ * 2 + mp * np_ * 2,
            transcendentals=mp * np_ if activation else 0),
        interpret=interpret,
    )(x, ln_scale.reshape(1, -1), ln_bias.reshape(1, -1), w,
      b.reshape(1, -1))
    return out[:m, :n]


def _matmul_residual_pallas(x, w, b, res, interpret: bool = False):
    x, m = _pad_rows(x, BM)
    mp, k = x.shape
    w, b, n = _pad_cols(w, b, 128)
    np_ = w.shape[1]
    res_p, _ = _pad_rows(res, BM)
    if np_ != n:
        res_p = jnp.pad(res_p, ((0, 0), (0, np_ - n)))

    if k * np_ * x.dtype.itemsize <= _FULLN_WEIGHT_BYTES:
        out = pl.pallas_call(
            _matmul_residual_fulln_kernel,
            out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
            grid=(mp // BM,),
            in_specs=[
                pl.BlockSpec((BM, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, np_), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, np_), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BM, np_), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, np_), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * mp * k * np_,
                bytes_accessed=mp * k * 2 + k * np_ * 2 + 2 * mp * np_ * 2,
                transcendentals=0),
            interpret=interpret,
        )(x, w, b.reshape(1, -1), res_p)
        return out[:m, :n]

    w, b, _ = _pad_cols(w, b.reshape(-1), BN)
    np_ = w.shape[1]
    if res_p.shape[1] != np_:
        res_p = jnp.pad(res_p, ((0, 0), (0, np_ - res_p.shape[1])))
    out = pl.pallas_call(
        _matmul_residual_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        grid=(mp // BM, np_ // BN),
        in_specs=[
            pl.BlockSpec((BM, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, BN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * k * np_,
            bytes_accessed=mp * k * 2 + k * np_ * 2 + 2 * mp * np_ * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, w, b.reshape(1, -1), res_p)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Reference (XLA) formulations + custom-VJP public API
# ---------------------------------------------------------------------------


def _ln_matmul_xla(x, ln_scale, ln_bias, w, b, activation=None, eps=1e-5):
    ln = _ln_rows(x.astype(jnp.float32), ln_scale.astype(jnp.float32),
                  ln_bias.astype(jnp.float32), eps=eps).astype(x.dtype)
    out = ln @ w + b.astype(x.dtype)
    if activation is not None:
        out = _act_f32(out.astype(jnp.float32), activation).astype(x.dtype)
    return out


def _matmul_residual_xla(x, w, b, res):
    return (x @ w + b.astype(x.dtype) + res).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ln_matmul(x, ln_scale, ln_bias, w, b, activation=None, eps=1e-5):
    """LN(x) @ w + b (+ optional activation epilogue) — fused on TPU.

    Exact-erf ``gelu`` takes the XLA path even on TPU: Mosaic has no
    erf/erfc lowering (probed on hardware — `NotImplementedError:
    Unimplemented primitive ... erfc`), while XLA lowers Erf natively."""
    if dispatch_backend() == "tpu" and activation != "gelu":
        return _ln_matmul_pallas(x, ln_scale, ln_bias, w, b, activation, eps)
    return _ln_matmul_xla(x, ln_scale, ln_bias, w, b, activation, eps)


def _ln_matmul_fwd(x, ln_scale, ln_bias, w, b, activation, eps):
    return ln_matmul(x, ln_scale, ln_bias, w, b, activation, eps), (
        x, ln_scale, ln_bias, w, b)


def _ln_matmul_bwd(activation, eps, res, g):
    x, ln_scale, ln_bias, w, b = res
    _, vjp = jax.vjp(lambda *a: _ln_matmul_xla(*a, activation, eps), x,
                     ln_scale, ln_bias, w, b)
    return vjp(g)


ln_matmul.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)


@jax.custom_vjp
def matmul_residual(x, w, b, res):
    """x @ w + b + res — fused on TPU."""
    if dispatch_backend() == "tpu":
        return _matmul_residual_pallas(x, w, b, res)
    return _matmul_residual_xla(x, w, b, res)


def _mr_fwd(x, w, b, res):
    return matmul_residual(x, w, b, res), (x, w, b, res)


def _mr_bwd(resids, g):
    x, w, b, res = resids
    _, vjp = jax.vjp(_matmul_residual_xla, x, w, b, res)
    return vjp(g)


matmul_residual.defvjp(_mr_fwd, _mr_bwd)
