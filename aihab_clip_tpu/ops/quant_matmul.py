"""Fused W8A8 quantized matmul (Pallas TPU kernel).

Motivation (measured, v5e, [50432, 768] x [768, 3072]):
  * bf16 dense + bias:            0.95 ms
  * unfused quant_dense (XLA):    1.22 ms  — the separate activation
    quantize pass (0.44 ms of pure extra HBM traffic) costs more than
    the int8 MXU rate (~2.1x bf16) saves.
This kernel removes that pass: each grid program loads one M-tile of the
bf16 activations into VMEM ONCE, computes per-row amax / quantizes in
VMEM, runs the int8 x int8 -> int32 GEMM against the VMEM-resident int8
weights (int8 halves their footprint — a whole ViT-B c_fc is 2.25 MB),
and applies dequant + bias + activation (+ optional residual) in the
epilogue before writing bf16 out.  HBM traffic is identical to the bf16
dense; the GEMM runs at the int8 rate.

Backward: not provided — this is a serving/encode path (quantized
inference); training stays bf16.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _apply_act(y, act: str):
    if act == "quick_gelu":
        return y * jax.nn.sigmoid(1.702 * y)
    if act == "gelu_tanh":
        return jax.nn.gelu(y, approximate=True)
    if act == "gelu":
        return jax.nn.gelu(y, approximate=False)
    if act == "gelu_poly":
        from .block_kernel import gelu_fast_f32

        return gelu_fast_f32(y)
    if act != "none":
        raise ValueError(f"unknown activation '{act}'")
    return y


def _kernel(x_ref, w8_ref, ws_ref, b_ref, o_ref, *, act: str,
            has_residual: bool, r_ref=None,
            ln_scale_ref=None, ln_bias_ref=None, ln_eps: float = 1e-5):
    x = x_ref[:].astype(jnp.float32)                     # [TM, K]
    if ln_scale_ref is not None:                         # fused LN prologue
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + ln_eps)
        x = x * ln_scale_ref[:][None, :] + ln_bias_ref[:][None, :]
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)   # [TM, 1]
    sx = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    x8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot(x8, w8_ref[:],
                      preferred_element_type=jnp.int32)  # [TM, N]
    y = acc.astype(jnp.float32) * (sx * ws_ref[:][None, :])
    y = y + b_ref[:][None, :]
    y = _apply_act(y, act)
    if has_residual:
        y = y + r_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def _pick_tile(m: int, k: int, n: int, x_itemsize: int = 2) -> int:
    """M-tile size: keep x-tile + int32 acc + out within ~12 MB VMEM
    alongside the resident weights.  ``x_itemsize`` sizes the activation
    tile (bf16 by default; f32 activations double it).  Shrinks to 64/32
    rows before giving up so large-K shapes degrade instead of blowing
    the budget (an M=32 GEMM underfills the MXU but still compiles)."""
    budget = 12 * 1024 * 1024

    def fits(tm):
        return (tm * k * x_itemsize  # x tile
                + tm * n * 4         # int32 acc
                + tm * n * 2         # out bf16
                + k * n              # w8 resident
                + tm * k             # x8
                ) <= budget

    tiles = (512, 256, 128, 64, 32)
    for tm in tiles:                 # prefer a tile that divides m exactly
        if fits(tm) and m % tm == 0:
            return tm
    for tm in tiles:                 # otherwise the largest fitting tile
        if fits(tm):                 # (callers pad m up to a multiple)
            return tm
    raise ValueError(
        f"no M-tile fits VMEM for quant matmul shape [{m}, {k}] x "
        f"[{k}, {n}] (weights alone: {k * n / 2 ** 20:.1f} MB)")


def _kernel_qout(x_ref, w8_ref, ws_ref, b_ref, ln_s_ref, ln_b_ref,
                 o8_ref, os_ref, *, act: str, ln_eps: float = 1e-5):
    """Like _kernel with LN prologue, but the epilogue REQUANTIZES the
    activated output to int8 + per-row scales (for a following int8-input
    GEMM): the widest activation tensor is written at 1 byte/elem."""
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + ln_eps)
    x = x * ln_s_ref[:][None, :] + ln_b_ref[:][None, :]
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    x8 = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot(x8, w8_ref[:], preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * ws_ref[:][None, :])
    y = y + b_ref[:][None, :]
    y = _apply_act(y, act)
    oamax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    osx = jnp.maximum(oamax, 1e-12) * (1.0 / 127.0)
    o8_ref[:] = jnp.clip(jnp.round(y / osx), -127, 127).astype(jnp.int8)
    os_ref[:] = osx


def _kernel_q8in(x8_ref, sx_ref, w8_ref, ws_ref, b_ref, r_ref, o_ref):
    """int8-input GEMM: x already quantized (e.g. by _kernel_qout) — no
    quantize pass, 1-byte reads of the wide activation."""
    acc = jax.lax.dot(x8_ref[:], w8_ref[:],
                      preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (sx_ref[:] * ws_ref[:][None, :])
    y = y + b_ref[:][None, :]
    y = y + r_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def quant_matmul_fused_qout(x, w8, w_scale, bias, ln_scale, ln_bias,
                            act: str = "quick_gelu", ln_eps: float = 1e-5,
                            interpret: bool = False):
    """LN -> W8A8 GEMM -> act -> requantize: returns (y8 [M, N] int8,
    y_scale [M, 1] f32)."""
    m, k = x.shape
    n = w8.shape[1]
    tm = _pick_tile(m, k, n, x.dtype.itemsize)
    m_pad = ((m + tm - 1) // tm) * tm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    y8, ys = pl.pallas_call(
        partial(_kernel_qout, act=act, ln_eps=ln_eps),
        out_shape=(jax.ShapeDtypeStruct((m_pad, n), jnp.int8),
                   jax.ShapeDtypeStruct((m_pad, 1), jnp.float32)),
        grid=(m_pad // tm,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((k,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, w8, jnp.asarray(w_scale, jnp.float32),
      jnp.asarray(bias, jnp.float32),
      jnp.asarray(ln_scale, jnp.float32), jnp.asarray(ln_bias, jnp.float32))
    return y8[:m], ys[:m]


def quant_matmul_q8in(x8, x_scale, w8, w_scale, bias, residual,
                      interpret: bool = False):
    """y = dequant(x8 @ w8) + bias + residual for pre-quantized inputs."""
    m, k = x8.shape
    n = w8.shape[1]
    tm = _pick_tile(m, k, n)
    m_pad = ((m + tm - 1) // tm) * tm
    if m_pad != m:
        x8 = jnp.pad(x8, ((0, m_pad - m), (0, 0)))
        x_scale = jnp.pad(x_scale, ((0, m_pad - m), (0, 0)))
        residual = jnp.pad(residual, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _kernel_q8in,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), residual.dtype),
        grid=(m_pad // tm,),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x8, jnp.asarray(x_scale, jnp.float32), w8,
      jnp.asarray(w_scale, jnp.float32), jnp.asarray(bias, jnp.float32),
      residual)
    return out[:m]


def _mlp_block_kernel_int8(x_ref, ln_s_ref, ln_b_ref, w1_ref, s1_ref,
                           b1_ref, w2_ref, s2_ref, b2_ref, o_ref, *,
                           act: str, ln_eps: float):
    """Whole-block int8 MLP: LN -> W8A8 c_fc -> act -> requantize (in
    VMEM) -> W8A8 c_proj -> +residual, one program per row tile.

    Versus the qout->q8in pair this removes the int8 hidden tensor's HBM
    round-trip entirely — at SigLIP SO400M shapes (batch 64, S=729,
    hidden 4304) that tensor is ~200 MB per direction per block.

    MEASURED VERDICT (v5e): wins in ISOLATION at every production shape
    (SO400M 3.69 vs 4.37 ms; ViT-L 2.42 vs 2.51; ViT-B 1.93 vs 1.98,
    128-row tiles) but measured SLOWER IN-TOWER (SigLIP e2e 294 vs 283 ms
    same-session A/B) — holding both weight matrices plus the f32 hidden
    tile keeps VMEM near capacity, which in a real tower (alternating
    with the attention kernels) degrades pipelining in a way the
    single-kernel fori_loop microbenchmark does not reproduce.  The int8
    towers therefore dispatch the chained pair; this kernel is kept
    (tested) for shapes with more VMEM headroom."""
    x = x_ref[:].astype(jnp.float32)                     # [TM, W]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    ln = (x - mean) * jax.lax.rsqrt(var + ln_eps)
    ln = ln * ln_s_ref[:][None, :] + ln_b_ref[:][None, :]
    amax = jnp.max(jnp.abs(ln), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    x8 = jnp.clip(jnp.round(ln / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot(x8, w1_ref[:],
                      preferred_element_type=jnp.int32)  # [TM, H]
    h = acc.astype(jnp.float32) * (sx * s1_ref[:][None, :])
    h = _apply_act(h + b1_ref[:][None, :], act)
    hmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    hs = jnp.maximum(hmax, 1e-12) * (1.0 / 127.0)
    h8 = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot(h8, w2_ref[:],
                       preferred_element_type=jnp.int32)  # [TM, W]
    y = acc2.astype(jnp.float32) * (hs * s2_ref[:][None, :])
    y = y + b2_ref[:][None, :] + x                        # residual = pre-LN x
    o_ref[:] = y.astype(o_ref.dtype)


def quant_mlp_block_fused(x, w1_8, w1_scale, b1, w2_8, w2_scale, b2,
                          ln_scale, ln_bias, act: str = "quick_gelu",
                          ln_eps: float = 1e-5, tile_m: int = 0,
                          interpret: bool = False):
    """x [M, W] -> x + int8_c_proj(act(int8_c_fc(LN(x)))) in one kernel.

    Both int8 weight matrices stay VMEM-resident across the grid — int8
    halves their footprint, which is what makes the whole-block MLP fit
    where the bf16 variant cannot (SigLIP SO400M: 9.9 MB int8 vs 19.8 MB
    bf16; ViT-L: 8.4 vs 16.8)."""
    m, w = x.shape
    hidden = w1_8.shape[1]
    if not tile_m:
        # 128-row tiles measured fastest at every production shape (SigLIP
        # 3.69 vs 4.09 ms at 64 rows; ViT-L 2.42 vs 3.49 — PERF_NOTES.md)
        # and fit even SO400M's 9.9 MB int8 weight pair: Mosaic's real
        # buffer liveness is well under the naive all-live estimate, so
        # only fall back for hypothetical wider-than-SO400M models.
        weights = w * hidden + hidden * w
        bufs128 = 128 * (w * 13 + hidden * 9)
        tile_m = 128 if weights + bufs128 <= int(17 * 1024 * 1024) else 64
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        partial(_mlp_block_kernel_int8, act=act, ln_eps=ln_eps),
        out_shape=jax.ShapeDtypeStruct((m_pad, w), x.dtype),
        grid=(m_pad // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(ln_scale, jnp.float32), jnp.asarray(ln_bias, jnp.float32),
      w1_8, jnp.asarray(w1_scale, jnp.float32), jnp.asarray(b1, jnp.float32),
      w2_8, jnp.asarray(w2_scale, jnp.float32), jnp.asarray(b2, jnp.float32))
    return out[:m]


def _convnext_mlp_kernel_int8(y_ref, res_ref, ln_s_ref, ln_b_ref, w1_ref,
                              s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                              g_ref, o_ref, *, act: str, ln_eps: float):
    """int8 ConvNeXt MLP sub-block on a row tile: LN(y) -> quantize ->
    W8A8 fc1 -> GELU -> requantize (in VMEM) -> W8A8 fc2 -> gamma ->
    + residual.  The `_mlp_block_kernel_int8` structure with ConvNeXt's
    quirks: eps-1e-6 LN, layer-scale gamma, residual DISTINCT from the
    LN input (y = dwconv output), exact-GELU via `gelu_poly`."""
    y = y_ref[:].astype(jnp.float32)                       # [TM, C]
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    ln = (y - mean) * jax.lax.rsqrt(var + ln_eps)
    ln = ln * ln_s_ref[:][None, :] + ln_b_ref[:][None, :]
    amax = jnp.max(jnp.abs(ln), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    x8 = jnp.clip(jnp.round(ln / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot(x8, w1_ref[:],
                      preferred_element_type=jnp.int32)    # [TM, H]
    h = acc.astype(jnp.float32) * (sx * s1_ref[:][None, :])
    h = _apply_act(h + b1_ref[:][None, :], act)
    hmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    hs = jnp.maximum(hmax, 1e-12) * (1.0 / 127.0)
    h8 = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot(h8, w2_ref[:],
                       preferred_element_type=jnp.int32)   # [TM, C]
    out = acc2.astype(jnp.float32) * (hs * s2_ref[:][None, :])
    out = (out + b2_ref[:][None, :]) * g_ref[:][None, :]
    o_ref[:] = (res_ref[:].astype(jnp.float32) + out).astype(o_ref.dtype)


def quant_convnext_mlp_block(y, residual, ln_scale, ln_bias, w1_8,
                             w1_scale, b1, w2_8, w2_scale, b2, gamma, *,
                             act: str = "gelu_poly", ln_eps: float = 1e-6,
                             tile_m: int = 0, interpret: bool = False):
    """``residual + gamma * int8_fc2(GELU(int8_fc1(LN(y))))`` over
    [M, C] rows — the int8 twin of `block_kernel.convnext_mlp_block`.
    int8 halves the weight pair, so even the widest base_w stage
    (C=1024, H=4096: 8.4 MB) fits one kernel unchunked."""
    m, c = y.shape
    hidden = w1_8.shape[1]
    if not tile_m:
        weights = c * hidden + hidden * c
        bufs128 = 128 * (c * 13 + hidden * 9)
        tile_m = 128 if weights + bufs128 <= int(17 * 1024 * 1024) else 64
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m
    if m_pad != m:
        y = jnp.pad(y, ((0, m_pad - m), (0, 0)))
        residual = jnp.pad(residual, ((0, m_pad - m), (0, 0)))
    row = pl.BlockSpec((tile_m, c), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    vec_h = pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_convnext_mlp_kernel_int8, act=act, ln_eps=ln_eps),
        out_shape=jax.ShapeDtypeStruct((m_pad, c), y.dtype),
        grid=(m_pad // tile_m,),
        in_specs=[
            row, row, vec_c, vec_c,
            pl.BlockSpec((c, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM), vec_h, vec_h,
            pl.BlockSpec((hidden, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM), vec_c, vec_c, vec_c,
        ],
        out_specs=row,
        interpret=interpret,
    )(y, residual, jnp.asarray(ln_scale, jnp.float32),
      jnp.asarray(ln_bias, jnp.float32),
      w1_8, jnp.asarray(w1_scale, jnp.float32), jnp.asarray(b1, jnp.float32),
      w2_8, jnp.asarray(w2_scale, jnp.float32), jnp.asarray(b2, jnp.float32),
      jnp.asarray(gamma, jnp.float32))
    return out[:m]


def _dispatch_kernel(*refs, act: str, has_res: bool, has_ln: bool,
                     ln_eps: float = 1e-5):
    """refs order: x, w8, ws, b, [ln_scale, ln_bias], [residual], out."""
    it = iter(refs)
    x_ref, w8_ref, ws_ref, b_ref = next(it), next(it), next(it), next(it)
    ln_s = next(it) if has_ln else None
    ln_b = next(it) if has_ln else None
    r_ref = next(it) if has_res else None
    o_ref = next(it)
    _kernel(x_ref, w8_ref, ws_ref, b_ref, o_ref, act=act,
            has_residual=has_res, r_ref=r_ref,
            ln_scale_ref=ln_s, ln_bias_ref=ln_b, ln_eps=ln_eps)


def quant_matmul_fused(x, w8, w_scale, bias, act: str = "none",
                       residual=None, ln_scale=None, ln_bias=None,
                       ln_eps: float = 1e-5, interpret: bool = False):
    """y = act(dequant(q(opt_LN(x)) @ w8) + bias) [+ residual].

    x [M, K] bf16/f32 (M padded to the tile size here), w8 [K, N] int8,
    w_scale [N] f32, bias [N] f32.  ``ln_scale``/``ln_bias`` fuse a
    LayerNorm over K into the prologue (computed fp32 in VMEM — the
    separate LN HBM round-trip disappears).
    """
    m, k = x.shape
    n = w8.shape[1]
    tm = _pick_tile(m, k, n, x.dtype.itemsize)
    m_pad = ((m + tm - 1) // tm) * tm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
        if residual is not None:
            residual = jnp.pad(residual, ((0, m_pad - m), (0, 0)))

    has_res = residual is not None
    has_ln = ln_scale is not None
    args = [x, w8, jnp.asarray(w_scale, jnp.float32),
            jnp.asarray(bias, jnp.float32)]
    in_specs = [
        pl.BlockSpec((tm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
    ]
    if has_ln:
        args += [jnp.asarray(ln_scale, jnp.float32),
                 jnp.asarray(ln_bias, jnp.float32)]
        in_specs += [pl.BlockSpec((k,), lambda i: (0,),
                                  memory_space=pltpu.VMEM)] * 2
    if has_res:
        args.append(residual)
        in_specs.append(pl.BlockSpec((tm, n), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        partial(_dispatch_kernel, act=act, has_res=has_res, has_ln=has_ln,
                ln_eps=ln_eps),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        grid=(m_pad // tm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out[:m]


# ---------------------------------------------------------------------------
# Whole-block int8 attention: LN -> W8A8 QKV -> MHA -> W8A8 out-proj ->
# +residual in one program per image
# ---------------------------------------------------------------------------


def _attn_block_kernel_int8(x_ref, ln_s_ref, ln_b_ref, wqkv8_ref, sqkv_ref,
                            bqkv_ref, wout8_ref, sout_ref, bout_ref, o_ref,
                            *, heads: int, seq_len: int,
                            ln_eps: float = 1e-5):
    """Blocks: x/o [1, S_pad, W]; int8 weights whole (QKV + out-proj
    quantized per output channel, activations per row in VMEM).  The
    attention core (scores/softmax/PV) runs bf16-GEMM/f32-softmax exactly
    like the bf16 whole-block kernel — only the two big GEMMs take the
    int8 MXU rate."""
    import math as _math

    s_pad, width = x_ref.shape[1], x_ref.shape[2]
    head_dim = width // heads
    x = x_ref[0].astype(jnp.float32)                     # [S, W]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    ln1 = (x - mean) * jax.lax.rsqrt(var + ln_eps)
    ln1 = ln1 * ln_s_ref[:][None, :] + ln_b_ref[:][None, :]
    amax = jnp.max(jnp.abs(ln1), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    x8 = jnp.clip(jnp.round(ln1 / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot(x8, wqkv8_ref[:],
                      preferred_element_type=jnp.int32)  # [S, 3W]
    qkv = acc.astype(jnp.float32) * (sx * sqkv_ref[:][None, :])
    qkv = qkv + bqkv_ref[:][None, :]

    scale = 1.0 / _math.sqrt(head_dim)
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_ok = col < seq_len
    outs = []
    for h in range(heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim] * scale
        k = qkv[:, width + h * head_dim:width + (h + 1) * head_dim]
        v = qkv[:, 2 * width + h * head_dim:2 * width + (h + 1) * head_dim]
        s = jax.lax.dot_general(q.astype(jnp.bfloat16),
                                k.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(key_ok, s, jnp.float32(-1e30))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot(p.astype(jnp.bfloat16),
                                v.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=-1)                # [S, W] f32
    aamax = jnp.max(jnp.abs(attn), axis=-1, keepdims=True)
    sa = jnp.maximum(aamax, 1e-12) * (1.0 / 127.0)
    a8 = jnp.clip(jnp.round(attn / sa), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot(a8, wout8_ref[:],
                       preferred_element_type=jnp.int32)  # [S, W]
    out = acc2.astype(jnp.float32) * (sa * sout_ref[:][None, :])
    out = out + bout_ref[:][None, :] + x
    o_ref[0] = out.astype(o_ref.dtype)


def quant_attn_block_fused(x, wqkv8, qkv_scale, b_qkv, wout8, out_scale,
                           b_out, ln_scale, ln_bias, heads: int,
                           interpret: bool = False, padded_io: bool = False,
                           seq_len: int | None = None):
    """x: [B, S, W] -> x + int8_out_proj(MHA(int8_qkv(LN(x)))).  One grid
    program per image; S pads to the 16 sublane multiple (the bf16
    whole-block padding finding applies unchanged).
    ``padded_io``/``seq_len``: see ``block_kernel.attn_block_fused``."""
    b, s, w = x.shape
    if padded_io:
        if seq_len is None:
            raise ValueError("padded_io=True requires seq_len")
        if s % 16:
            raise ValueError(f"padded_io input S={s} not a multiple of 16")
        s_pad, s = s, seq_len
    else:
        s_pad = ((s + 15) // 16) * 16
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    out = pl.pallas_call(
        partial(_attn_block_kernel_int8, heads=heads, seq_len=s),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, w), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s_pad, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 3 * w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(ln_scale, jnp.float32), jnp.asarray(ln_bias, jnp.float32),
      wqkv8, jnp.asarray(qkv_scale, jnp.float32),
      jnp.asarray(b_qkv, jnp.float32),
      wout8, jnp.asarray(out_scale, jnp.float32),
      jnp.asarray(b_out, jnp.float32))
    return out if padded_io else out[:, :s, :]


# ---------------------------------------------------------------------------
# Head-group-SPLIT whole-block int8 attention: for towers whose whole-block
# attention exceeds VMEM (SigLIP SO400M: S=736, W=1152)
# ---------------------------------------------------------------------------


def _attn_block_split_kernel(x_ref, ln_s_ref, ln_b_ref, wqkv8_ref, sqkv_ref,
                             bqkv_ref, wout8_ref, sout_ref, bout_ref, o_ref,
                             x8_scr, sx_scr, acc_scr, *,
                             heads_per_group: int, seq_len: int,
                             head_dim: int, n_groups: int,
                             ln_eps: float = 1e-5):
    """Grid (image, head_group), head_group minor.  Each program computes
    ``heads_per_group`` heads' QKV + attention + out-proj PARTIAL and
    accumulates into an f32 VMEM scratch (bf16 accumulation across
    groups would add ~0.5% random-walk error on top of the int8 noise);
    the output block is written once, at the last group.  The quantized
    LN(x) is computed once per image (group 0) and persisted in scratch
    — scratch survives grid steps on TPU."""
    import math as _math

    hg = pl.program_id(1)
    s_pad = x_ref.shape[1]
    g = heads_per_group

    @pl.when(hg == 0)
    def _():
        x = x_ref[0].astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        ln1 = (x - mean) * jax.lax.rsqrt(var + ln_eps)
        ln1 = ln1 * ln_s_ref[:][None, :] + ln_b_ref[:][None, :]
        amax = jnp.max(jnp.abs(ln1), axis=-1, keepdims=True)
        sx = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
        x8_scr[:] = jnp.clip(jnp.round(ln1 / sx), -127, 127).astype(jnp.int8)
        sx_scr[:] = sx

    x8 = x8_scr[:]
    sx = sx_scr[:]
    acc = jax.lax.dot(x8, wqkv8_ref[0],
                      preferred_element_type=jnp.int32)   # [S, 3*g*D]
    qkv = acc.astype(jnp.float32) * (sx * sqkv_ref[0, 0][None, :])
    qkv = qkv + bqkv_ref[0, 0][None, :]

    scale = 1.0 / _math.sqrt(head_dim)
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_ok = col < seq_len
    gw = g * head_dim
    outs = []
    for h in range(g):
        q = qkv[:, h * head_dim:(h + 1) * head_dim] * scale
        k = qkv[:, gw + h * head_dim:gw + (h + 1) * head_dim]
        v = qkv[:, 2 * gw + h * head_dim:2 * gw + (h + 1) * head_dim]
        s = jax.lax.dot_general(q.astype(jnp.bfloat16),
                                k.astype(jnp.bfloat16),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(key_ok, s, jnp.float32(-1e30))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot(p.astype(jnp.bfloat16),
                                v.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=-1)                 # [S, g*D] f32
    aamax = jnp.max(jnp.abs(attn), axis=-1, keepdims=True)
    sa = jnp.maximum(aamax, 1e-12) * (1.0 / 127.0)
    a8 = jnp.clip(jnp.round(attn / sa), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot(a8, wout8_ref[0],
                       preferred_element_type=jnp.int32)  # [S, W]
    part = acc2.astype(jnp.float32) * (sa * sout_ref[:][None, :])

    @pl.when(hg == 0)
    def _():
        acc_scr[:] = part + bout_ref[:][None, :] + x_ref[0].astype(jnp.float32)

    @pl.when(hg > 0)
    def _():
        acc_scr[:] = acc_scr[:] + part

    @pl.when(hg == n_groups - 1)
    def _():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


def quant_attn_block_split(x, wqkv8_g, qkv_scale_g, b_qkv_g, wout8_g,
                           out_scale, b_out, ln_scale, ln_bias, heads: int,
                           n_groups: int, ln_eps: float = 1e-5,
                           interpret: bool = False, padded_io: bool = False,
                           seq_len: int | None = None):
    """Head-group-split whole-block int8 attention.

    ``wqkv8_g``   [n_groups, W, 3*g*D] — per-group packed q|k|v columns
    ``qkv_scale_g``/``b_qkv_g`` [n_groups, 3*g*D]
    ``wout8_g``   [n_groups, g*D, W] — per-group out-proj rows
    (use ``regroup_attn_weights`` to build these from [W, 3W]/[W, W]).

    The output block accumulates in VMEM across the minor grid axis —
    splitting drops per-program VMEM by ~n_groups on the QKV/out weights
    and the qkv/attn temporaries, which is what lets SO400M-scale towers
    (S=736, W=1152) run whole-block where the unsplit kernel fails to
    compile."""
    b, s, w = x.shape
    if heads % n_groups:
        raise ValueError(f"n_groups {n_groups} must divide heads {heads} "
                         "(a floored group size would silently drop heads)")
    g = heads // n_groups
    head_dim = w // heads
    if padded_io:
        if seq_len is None:
            raise ValueError("padded_io=True requires seq_len")
        if s % 16:
            raise ValueError(f"padded_io input S={s} not a multiple of 16")
        s_pad, s = s, seq_len
    else:
        s_pad = ((s + 15) // 16) * 16
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    gcols = 3 * g * head_dim
    out = pl.pallas_call(
        partial(_attn_block_split_kernel, heads_per_group=g, seq_len=s,
                head_dim=head_dim, n_groups=n_groups, ln_eps=ln_eps),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, w), x.dtype),
        grid=(b, n_groups),
        in_specs=[
            pl.BlockSpec((1, s_pad, w), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, gcols), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            # scales/biases carried [n, 1, gcols]: a (1, gcols) block has
            # a sublane dim of 1, which Mosaic rejects unless it equals
            # the array dim — the extra singleton axis makes it so
            pl.BlockSpec((1, 1, gcols), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, gcols), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * head_dim, w), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s_pad, w), jnp.int8),
                        pltpu.VMEM((s_pad, 1), jnp.float32),
                        pltpu.VMEM((s_pad, w), jnp.float32)],
        interpret=interpret,
    )(x, jnp.asarray(ln_scale, jnp.float32), jnp.asarray(ln_bias, jnp.float32),
      wqkv8_g,
      jnp.asarray(qkv_scale_g, jnp.float32)[:, None, :],
      jnp.asarray(b_qkv_g, jnp.float32)[:, None, :],
      wout8_g, jnp.asarray(out_scale, jnp.float32),
      jnp.asarray(b_out, jnp.float32))
    return out if padded_io else out[:, :s, :]


# ---------------------------------------------------------------------------
# Merged FULL-block int8 kernel: attention + MLP in ONE program per image
# ---------------------------------------------------------------------------


def _full_block_kernel_int8(x_ref, ln1_s_ref, ln1_b_ref, wqkv8_ref, sqkv_ref,
                            bqkv_ref, wout8_ref, sout_ref, bout_ref,
                            ln2_s_ref, ln2_b_ref, w1_ref, s1_ref, b1_ref,
                            w2_ref, s2_ref, b2_ref, o_ref, *, heads: int,
                            seq_len: int, mlp_chunks: int, act: str,
                            ln_eps: float = 1e-5):
    """The whole transformer block — int8 attention half + int8 MLP half —
    in one program per image GROUP.  The int8 weight set is about half
    the bf16 one (~7 MB at ViT-B), which is what makes the merged kernel
    fit where the bf16 merge is VMEM-borderline.  Versus the two-kernel
    int8 dispatch this removes the inter-half [B, S, W] HBM round-trip
    and the pipeline drain between the calls.  Blocks x/o are
    [G, S_pad, W] (r5): short-sequence towers (ViT-B/32: S_pad=64) run G
    images per program so the int8 GEMMs see G*S_pad rows instead of an
    under-filled 64-row M tile — the same tile-fill win the bf16 merge
    measured (+12% at G=8, PERF_NOTES r4); per-row quantize scales are
    row-local, so the math is G-invariant."""
    import math as _math

    n_img, s_pad, width = x_ref.shape
    head_dim = width // heads
    x = x_ref[:].astype(jnp.float32).reshape(n_img * s_pad, width)

    # ---- attention half (per-row quantized activations, int8 GEMMs)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    ln1 = (x - mean) * jax.lax.rsqrt(var + ln_eps)
    ln1 = ln1 * ln1_s_ref[:][None, :] + ln1_b_ref[:][None, :]
    amax = jnp.max(jnp.abs(ln1), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    x8 = jnp.clip(jnp.round(ln1 / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot(x8, wqkv8_ref[:],
                      preferred_element_type=jnp.int32)  # [S, 3W]
    qkv = acc.astype(jnp.float32) * (sx * sqkv_ref[:][None, :])
    qkv = qkv + bqkv_ref[:][None, :]

    scale = 1.0 / _math.sqrt(head_dim)
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_ok = col < seq_len
    imgs = []
    for gi in range(n_img):
        qkv_g = qkv[gi * s_pad:(gi + 1) * s_pad]
        outs = []
        for h in range(heads):
            q = qkv_g[:, h * head_dim:(h + 1) * head_dim] * scale
            k = qkv_g[:, width + h * head_dim:width + (h + 1) * head_dim]
            v = qkv_g[:, 2 * width + h * head_dim:
                      2 * width + (h + 1) * head_dim]
            s = jax.lax.dot_general(q.astype(jnp.bfloat16),
                                    k.astype(jnp.bfloat16),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = jnp.where(key_ok, s, jnp.float32(-1e30))
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jax.lax.dot(p.astype(jnp.bfloat16),
                                    v.astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32))
        imgs.append(jnp.concatenate(outs, axis=-1))      # [S, W] f32
    attn = imgs[0] if n_img == 1 else jnp.concatenate(imgs, axis=0)
    aamax = jnp.max(jnp.abs(attn), axis=-1, keepdims=True)
    sa = jnp.maximum(aamax, 1e-12) * (1.0 / 127.0)
    a8 = jnp.clip(jnp.round(attn / sa), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot(a8, wout8_ref[:],
                       preferred_element_type=jnp.int32)  # [S, W]
    y1 = acc2.astype(jnp.float32) * (sa * sout_ref[:][None, :])
    y1 = y1 + bout_ref[:][None, :] + x                   # residual stream

    # ---- MLP half (hidden dim chunked to bound f32/int8 tile liveness)
    mean2 = jnp.mean(y1, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(y1 - mean2), axis=-1, keepdims=True)
    ln2 = (y1 - mean2) * jax.lax.rsqrt(var2 + ln_eps)
    ln2 = ln2 * ln2_s_ref[:][None, :] + ln2_b_ref[:][None, :]
    lmax = jnp.max(jnp.abs(ln2), axis=-1, keepdims=True)
    sl = jnp.maximum(lmax, 1e-12) * (1.0 / 127.0)
    l8 = jnp.clip(jnp.round(ln2 / sl), -127, 127).astype(jnp.int8)
    hidden = w1_ref.shape[1]
    ch = hidden // mlp_chunks
    out = y1 + b2_ref[:][None, :]
    for c in range(mlp_chunks):
        hacc = jax.lax.dot(l8, w1_ref[:, c * ch:(c + 1) * ch],
                           preferred_element_type=jnp.int32)  # [S, ch]
        h = hacc.astype(jnp.float32) * (sl * s1_ref[c * ch:(c + 1) * ch][None, :])
        h = _apply_act(h + b1_ref[c * ch:(c + 1) * ch][None, :], act)
        hmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        hs = jnp.maximum(hmax, 1e-12) * (1.0 / 127.0)
        h8 = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
        pacc = jax.lax.dot(h8, w2_ref[c * ch:(c + 1) * ch, :],
                           preferred_element_type=jnp.int32)  # [S, W]
        out = out + pacc.astype(jnp.float32) * (hs * s2_ref[:][None, :])
    o_ref[:] = out.reshape(n_img, s_pad, width).astype(o_ref.dtype)


def quant_full_block_fused(x, wqkv8, qkv_scale, b_qkv, wout8, out_scale,
                           b_out, ln1_scale, ln1_bias, w1_8, w1_scale, b1,
                           w2_8, w2_scale, b2, ln2_scale, ln2_bias,
                           heads: int, *, mlp_chunks: int = 1,
                           act: str = "quick_gelu",
                           interpret: bool = False,
                           images_per_program: int = 1):
    """x: [B, S, W] -> one full int8 transformer block per grid program
    (group of ``images_per_program`` images — see the kernel docstring;
    falls back to the largest power-of-two divisor of the batch).

    NOTE the per-chunk hidden quantization: with ``mlp_chunks > 1`` each
    hidden slice gets its own per-row scale, which is numerically at
    least as accurate as the single-scale whole-hidden path."""
    b, s, w = x.shape
    hidden = w1_8.shape[1]
    assert hidden % mlp_chunks == 0, (hidden, mlp_chunks)
    g = images_per_program if images_per_program > 0 else 1
    while g > 1 and b % g:
        g //= 2
    s_pad = ((s + 15) // 16) * 16
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    out = pl.pallas_call(
        partial(_full_block_kernel_int8, heads=heads, seq_len=s,
                mlp_chunks=mlp_chunks, act=act),
        out_shape=jax.ShapeDtypeStruct((b, s_pad, w), x.dtype),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((g, s_pad, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, 3 * w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s_pad, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(ln1_scale, jnp.float32),
      jnp.asarray(ln1_bias, jnp.float32),
      wqkv8, jnp.asarray(qkv_scale, jnp.float32),
      jnp.asarray(b_qkv, jnp.float32),
      wout8, jnp.asarray(out_scale, jnp.float32),
      jnp.asarray(b_out, jnp.float32),
      jnp.asarray(ln2_scale, jnp.float32),
      jnp.asarray(ln2_bias, jnp.float32),
      w1_8, jnp.asarray(w1_scale, jnp.float32), jnp.asarray(b1, jnp.float32),
      w2_8, jnp.asarray(w2_scale, jnp.float32), jnp.asarray(b2, jnp.float32))
    return out[:, :s, :]


def regroup_attn_weights(wqkv8, qkv_scale, b_qkv, wout8, heads: int,
                         n_groups: int):
    """[W, 3W] packed q|k|v (+ scales/bias) and [W, W] out-proj ->
    per-head-group tensors for ``quant_attn_block_split``."""
    assert heads % n_groups == 0, (heads, n_groups)
    w = wqkv8.shape[0]
    head_dim = w // heads
    g = heads // n_groups

    def group_cols(t, axis):
        # t[..., 3W] with q|k|v sections -> [n_groups, ..., 3*g*D]
        sections = jnp.split(t, 3, axis=axis)  # q, k, v each [..., W]
        pieces = []
        for ng in range(n_groups):
            sl = slice(ng * g * head_dim, (ng + 1) * g * head_dim)
            idx = (slice(None),) * axis + (sl,)
            pieces.append(jnp.concatenate([sec[idx] for sec in sections],
                                          axis=axis))
        return jnp.stack(pieces, axis=0)

    wqkv_g = group_cols(wqkv8, 1)               # [n, W, 3gD]
    scale_g = group_cols(qkv_scale, 0)          # [n, 3gD]
    bias_g = group_cols(jnp.asarray(b_qkv, jnp.float32), 0)
    wout_g = jnp.stack([wout8[ng * g * head_dim:(ng + 1) * g * head_dim, :]
                        for ng in range(n_groups)], axis=0)  # [n, gD, W]
    return wqkv_g, scale_g, bias_g, wout_g
