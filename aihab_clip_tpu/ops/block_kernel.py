"""Whole-block fused ViT kernels (Pallas TPU).

The measured story so far (PERF_NOTES.md): per-op fused kernels win
individually but every ``pallas_call`` boundary materializes activations
to HBM, costing back what the op wins.  These kernels move the boundary
to the BLOCK level:

  * ``attn_block_fused`` — LN1 -> QKV -> multi-head attention ->
    out-proj -> +residual, one grid program per IMAGE (attention mixes
    tokens, so the program owns the whole sequence).  The QKV/out weights
    (~4.7 MB bf16 for ViT-B) stay VMEM-resident across the grid.
  * ``mlp_block_fused`` — LN2 -> c_fc -> QuickGELU -> c_proj ->
    +residual, grid over row tiles (no cross-token dependency), both MLP
    weights resident (~9.4 MB bf16).

Between the two halves a single [B*S, W] tensor round-trips HBM — versus
~6 elementwise round-trips in the unfused graph.  GEMMs run in the input
dtype with fp32 accumulation; LN/softmax in fp32 (the model's numerics
contract, `/root/reference/clip/model.py:151-157`).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_f32(x, scale, bias, eps=1e-5):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps)
    return out * scale[None, :] + bias[None, :]


def _attn_block_kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref,
                       wout_ref, bout_ref, o_ref, *, heads: int,
                       seq_len: int):
    """Blocks: x/o [1, S_pad, W]; weights whole."""
    s_pad, width = x_ref.shape[1], x_ref.shape[2]
    head_dim = width // heads
    x = x_ref[0].astype(jnp.float32)                       # [S, W]
    ln1 = _ln_f32(x, ln_s_ref[:], ln_b_ref[:])
    qkv = jax.lax.dot(ln1.astype(o_ref.dtype), wqkv_ref[:],
                      preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:][None, :]                       # [S, 3W] f32

    scale = 1.0 / math.sqrt(head_dim)
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_ok = col < seq_len
    outs = []
    for h in range(heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim] * scale
        k = qkv[:, width + h * head_dim:width + (h + 1) * head_dim]
        v = qkv[:, 2 * width + h * head_dim:2 * width + (h + 1) * head_dim]
        s = jax.lax.dot_general(q.astype(o_ref.dtype), k.astype(o_ref.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(key_ok, s, jnp.float32(-1e30))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot(p.astype(o_ref.dtype), v.astype(o_ref.dtype),
                                preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=-1)                  # [S, W] f32
    out = jax.lax.dot(attn.astype(o_ref.dtype), wout_ref[:],
                      preferred_element_type=jnp.float32)
    out = out + bout_ref[:][None, :] + x
    o_ref[0] = out.astype(o_ref.dtype)


def attn_block_fused(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                     heads: int, interpret: bool = False):
    """x: [B, S, W] -> x + out_proj(MHA(LN(x))).  One program per image."""
    b, s, w = x.shape
    s_pad = ((s + 127) // 128) * 128
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    out = pl.pallas_call(
        partial(_attn_block_kernel, heads=heads, seq_len=s),
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
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(ln_scale, jnp.float32), jnp.asarray(ln_bias, jnp.float32),
      w_qkv, jnp.asarray(b_qkv, jnp.float32),
      w_out, jnp.asarray(b_out, jnp.float32))
    return out[:, :s, :]


def _mlp_block_kernel(x_ref, ln_s_ref, ln_b_ref, wfc_ref, bfc_ref,
                      wpr_ref, bpr_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)                       # [TM, W]
    ln2 = _ln_f32(x, ln_s_ref[:], ln_b_ref[:])
    h = jax.lax.dot(ln2.astype(o_ref.dtype), wfc_ref[:],
                    preferred_element_type=jnp.float32)
    h = h + bfc_ref[:][None, :]
    h = h * jax.nn.sigmoid(1.702 * h)                      # QuickGELU
    out = jax.lax.dot(h.astype(o_ref.dtype), wpr_ref[:],
                      preferred_element_type=jnp.float32)
    out = out + bpr_ref[:][None, :] + x
    o_ref[:] = out.astype(o_ref.dtype)


def mlp_block_fused(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                    interpret: bool = False, tile_m: int = 0):
    """x: [M, W] -> x + c_proj(QuickGELU(c_fc(LN(x)))). Row-tiled grid."""
    m, w = x.shape
    hidden = w_fc.shape[1]
    if not tile_m:
        # keep x + f32 hidden + out + both weights within ~13 MB
        budget = 13 * 1024 * 1024 - 2 * (w * hidden + hidden * w)
        tile_m = 256 if 256 * (hidden * 4 + w * 8) <= budget else 128
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        _mlp_block_kernel,
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
            pl.BlockSpec((hidden, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(ln_scale, jnp.float32), jnp.asarray(ln_bias, jnp.float32),
      w_fc, jnp.asarray(b_fc, jnp.float32),
      w_proj, jnp.asarray(b_proj, jnp.float32))
    return out[:m]
