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
    """Blocks: x/o [G, S_pad, W] (G images per program; LN/QKV/out-proj
    GEMMs run on the G*S_pad row stack, the attention core loops
    (image, head)); weights whole."""
    n_img, s_pad, width = x_ref.shape
    head_dim = width // heads
    x = x_ref[:].astype(jnp.float32).reshape(n_img * s_pad, width)
    ln1 = _ln_f32(x, ln_s_ref[:], ln_b_ref[:])
    qkv = jax.lax.dot(ln1.astype(o_ref.dtype), wqkv_ref[:],
                      preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:][None, :]                       # [G*S, 3W] f32

    scale = 1.0 / math.sqrt(head_dim)
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_ok = col < seq_len
    rows = []
    for g in range(n_img):
        qkv_g = qkv[g * s_pad:(g + 1) * s_pad]
        outs = []
        for h in range(heads):
            q = qkv_g[:, h * head_dim:(h + 1) * head_dim] * scale
            k = qkv_g[:, width + h * head_dim:width + (h + 1) * head_dim]
            v = qkv_g[:, 2 * width + h * head_dim:
                      2 * width + (h + 1) * head_dim]
            s = jax.lax.dot_general(q.astype(o_ref.dtype),
                                    k.astype(o_ref.dtype),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = jnp.where(key_ok, s, jnp.float32(-1e30))
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(jax.lax.dot(p.astype(o_ref.dtype),
                                    v.astype(o_ref.dtype),
                                    preferred_element_type=jnp.float32))
        rows.append(jnp.concatenate(outs, axis=-1))        # [S, W] f32
    attn = jnp.concatenate(rows, axis=0)                   # [G*S, W] f32
    out = jax.lax.dot(attn.astype(o_ref.dtype), wout_ref[:],
                      preferred_element_type=jnp.float32)
    out = out + bout_ref[:][None, :] + x
    o_ref[:] = out.reshape(n_img, s_pad, width).astype(o_ref.dtype)


def attn_block_fused(x, ln_scale, ln_bias, w_qkv, b_qkv, w_out, b_out,
                     heads: int, interpret: bool = False,
                     padded_io: bool = False, seq_len: int | None = None,
                     images_per_program: int = 1):
    """x: [B, S, W] -> x + out_proj(MHA(LN(x))).  One program per image.

    S pads to a multiple of 16 (bf16 sublane), NOT 128: the score matrix
    and QKV/out GEMM row counts scale with s_pad, and 197->208 instead of
    197->256 measured 5.21 vs 5.73 ms/block for the full ViT-B block
    (Mosaic handles non-128 lane dims; pad-to-8 measured slightly worse,
    PERF_NOTES.md).

    ``padded_io``: x arrives already padded to [B, s_pad, W] (``seq_len``
    = the real S) and the padded result is returned un-sliced.  Valid
    rows are bit-identical either way — keys beyond seq_len are masked,
    and padded Q rows only produce garbage in their own (discarded)
    rows — so a block STACK can pad once and slice once instead of
    paying a full-tensor slice+re-pad copy pair at every kernel
    boundary (measured 0.50 ms/block of composition overhead at ViT-L
    b128, PERF_NOTES 'ViT-L attention core')."""
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
    g = images_per_program
    if b % g:
        raise ValueError(f"batch {b} not divisible by "
                         f"images_per_program={g}")
    out = pl.pallas_call(
        partial(_attn_block_kernel, heads=heads, seq_len=s),
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
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s_pad, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, jnp.asarray(ln_scale, jnp.float32), jnp.asarray(ln_bias, jnp.float32),
      w_qkv, jnp.asarray(b_qkv, jnp.float32),
      w_out, jnp.asarray(b_out, jnp.float32))
    return out if padded_io else out[:, :s, :]


# ---------------------------------------------------------------------------
# Differentiable whole-block MLP (training): fused forward emitting the
# pre-activation, fused backward for the dx chain
# ---------------------------------------------------------------------------


def _mlp_fwd_train_kernel(x_ref, ln_s_ref, ln_b_ref, wfc_ref, bfc_ref,
                          wpr_ref, bpr_ref, o_ref, hpre_ref):
    """Forward with residuals for backward: also writes h_pre (the c_fc
    pre-activation) so the backward pass needs NO GEMM recompute."""
    x = x_ref[:].astype(jnp.float32)
    ln2 = _ln_f32(x, ln_s_ref[:], ln_b_ref[:])
    h_pre = jax.lax.dot(ln2.astype(o_ref.dtype), wfc_ref[:],
                        preferred_element_type=jnp.float32)
    h_pre = h_pre + bfc_ref[:][None, :]
    hpre_ref[:] = h_pre.astype(hpre_ref.dtype)
    h = h_pre * jax.nn.sigmoid(1.702 * h_pre)
    out = jax.lax.dot(h.astype(o_ref.dtype), wpr_ref[:],
                      preferred_element_type=jnp.float32)
    o_ref[:] = (out + bpr_ref[:][None, :] + x).astype(o_ref.dtype)


def _quick_gelu_grad_f32(h_pre):
    s = jax.nn.sigmoid(1.702 * h_pre)
    return s * (1.0 + 1.702 * h_pre * (1.0 - s))


def _mlp_bwd_train_kernel(x_ref, hpre_ref, dy_ref, ln_s_ref,
                          wfc_ref, wpr_ref, dx_ref, dhpre_ref, dln_ref,
                          *, eps: float = 1e-5):
    """dx chain of the MLP block in ONE program (both weights resident):

      dh     = dy @ W2^T
      dh_pre = dh * quick_gelu'(h_pre)        -> emitted (for dW1/db1)
      dln    = dh_pre @ W1^T                  -> emitted (for dgamma/dbeta)
      dx     = dy + LN_bwd(dln; x, gamma)

    Weight/bias/LN-param grads are LEFT to XLA GEMMs/reductions over the
    emitted tensors — they are MXU-shaped contractions XLA runs at rate,
    and keeping them out of this kernel keeps dW work DCE-able for frozen
    blocks (PEFT)."""
    x = x_ref[:].astype(jnp.float32)                    # [TM, W]
    dy = dy_ref[:].astype(jnp.float32)
    h_pre = hpre_ref[:].astype(jnp.float32)             # [TM, H]

    # dy @ W2^T as a (1,1) contraction — no transpose materialized
    dh = jax.lax.dot_general(dy.astype(dy_ref.dtype), wpr_ref[:],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dh_pre = dh * _quick_gelu_grad_f32(h_pre)
    dhpre_ref[:] = dh_pre.astype(dhpre_ref.dtype)
    dln = jax.lax.dot_general(dh_pre.astype(dy_ref.dtype), wfc_ref[:],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dln_ref[:] = dln.astype(dln_ref.dtype)

    # LayerNorm backward (recompute mu/sigma from x — elementwise)
    w = x.shape[-1]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    dxhat = dln * ln_s_ref[:][None, :]
    dx_ln = (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
             - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)) * rstd
    del w
    dx_ref[:] = (dy + dx_ln).astype(dx_ref.dtype)


def mlp_block_train(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                    *, interpret: bool = False, tile_m: int = 128):
    """Differentiable whole-block MLP: x + c_proj(QuickGELU(c_fc(LN(x)))).

    Forward = one fused kernel (also emits h_pre); backward = one fused
    kernel for the dx chain + XLA GEMMs for dW1/dW2/db/dgamma/dbeta over
    the emitted h_pre/dh_pre/dln.  Gradients match the canonical XLA
    formulation (tested); fp32 LN/accum numerics contract preserved."""
    return _mlp_block_train(x, ln_scale, ln_bias, w_fc, b_fc, w_proj,
                            b_proj, interpret, tile_m)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _mlp_block_train(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                     interpret, tile_m):
    y, _ = _mlp_train_fwd_call(x, ln_scale, ln_bias, w_fc, b_fc, w_proj,
                               b_proj, interpret, tile_m)
    return y


def _mlp_train_fwd_call(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                        interpret, tile_m):
    m, w = x.shape
    hidden = w_fc.shape[1]
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m
    xp = jnp.pad(x, ((0, m_pad - m), (0, 0))) if m_pad != m else x
    y, h_pre = pl.pallas_call(
        _mlp_fwd_train_kernel,
        out_shape=(jax.ShapeDtypeStruct((m_pad, w), x.dtype),
                   jax.ShapeDtypeStruct((m_pad, hidden), x.dtype)),
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
        out_specs=(
            pl.BlockSpec((tile_m, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(xp, jnp.asarray(ln_scale, jnp.float32),
      jnp.asarray(ln_bias, jnp.float32),
      w_fc, jnp.asarray(b_fc, jnp.float32),
      w_proj, jnp.asarray(b_proj, jnp.float32))
    return y[:m], h_pre[:m]


def _mlp_train_fwd(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                   interpret, tile_m):
    y, h_pre = _mlp_train_fwd_call(x, ln_scale, ln_bias, w_fc, b_fc,
                                   w_proj, b_proj, interpret, tile_m)
    # b_fc/b_proj ride along only to give the bias grads their primal
    # dtypes (custom_vjp requires exact aval agreement)
    return y, (x, ln_scale, ln_bias, w_fc, w_proj, h_pre, b_fc, b_proj)


def _mlp_train_bwd(interpret, tile_m, res, dy):
    x, ln_scale, ln_bias, w_fc, w_proj, h_pre, b_fc, b_proj = res
    bfc_dt, bpr_dt = b_fc.dtype, b_proj.dtype
    m, w = x.shape
    hidden = w_fc.shape[1]
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m
    pad = lambda t: (jnp.pad(t, ((0, m_pad - m), (0, 0)))  # noqa: E731
                     if m_pad != m else t)
    dx, dh_pre, dln = pl.pallas_call(
        _mlp_bwd_train_kernel,
        out_shape=(jax.ShapeDtypeStruct((m_pad, w), x.dtype),
                   jax.ShapeDtypeStruct((m_pad, hidden), x.dtype),
                   jax.ShapeDtypeStruct((m_pad, w), x.dtype)),
        grid=(m_pad // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_m, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, hidden), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(pad(x), pad(h_pre), pad(dy),
      jnp.asarray(ln_scale, jnp.float32),
      w_fc, w_proj)
    dx, dh_pre, dln = dx[:m], dh_pre[:m], dln[:m]

    # weight/bias/LN-param grads: plain XLA contractions over the emitted
    # tensors (DCE-able when the block is frozen in PEFT)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xhat = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    ln2 = xhat * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    dln_f = dln.astype(jnp.float32)
    d_gamma = jnp.sum(dln_f * xhat, axis=0).astype(ln_scale.dtype)
    d_beta = jnp.sum(dln_f, axis=0).astype(ln_bias.dtype)
    dw_fc = jax.lax.dot(ln2.astype(x.dtype).T, dh_pre,
                        preferred_element_type=jnp.float32).astype(w_fc.dtype)
    db_fc = jnp.sum(dh_pre.astype(jnp.float32), axis=0).astype(bfc_dt)
    h_pre_f = h_pre.astype(jnp.float32)
    h = (h_pre_f * jax.nn.sigmoid(1.702 * h_pre_f)).astype(x.dtype)
    dw_proj = jax.lax.dot(h.T, dy,
                          preferred_element_type=jnp.float32
                          ).astype(w_proj.dtype)
    db_proj = jnp.sum(dy.astype(jnp.float32), axis=0).astype(bpr_dt)
    return (dx, d_gamma, d_beta, dw_fc, db_fc, dw_proj, db_proj)


_mlp_block_train.defvjp(_mlp_train_fwd, _mlp_train_bwd)


def _erf_f32_rational(x):
    """f32 erf from exp only (Abramowitz & Stegun 7.1.26, |err| <= 1.5e-7
    — below bf16 resolution).  Mosaic has no erf/erfc lowering (probed on
    hardware, PERF_NOTES "ViT-H"), so exact-GELU towers could not enter
    the fused kernels at all; this rational approximation unblocked them
    with sub-f32-epsilon activation error."""
    t = 1.0 / (1.0 + 0.3275911 * jnp.abs(x))
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(x) * (1.0 - poly * jnp.exp(-x * x))


# Degree-14 Chebyshev fit of erf(z)/z in u = 2 z^2 / B^2 - 1 on [0, B]
# (coefficients in u-monomials, highest degree first for Horner).  Pure
# FMA chain — no exp, no divide: the A&S rational costs TWO VPU
# transcendentals per element, which dominates the fused-MLP kernels at
# large-spatial/narrow-channel shapes (ConvNeXt stage 0: the [M, 4C]
# activation tensor is 4x stage 2's element count while the GEMM time is
# constant — PERF_NOTES "ConvNeXt erf").  f32-eval |err| <= 3.6e-7, same
# class as the rational; for |z| >= B, erf(z) = sign(z) to 2.6e-7.
_ERF_CHEB_B = 3.6
_ERF_CHEB_COEF = (
    0.0005088007148386333, -0.0011450745066218335, 0.0009553941424598827,
    -0.0023067730846365714, 0.006732319810367243, -0.012240412571535311,
    0.01987247702073693, -0.03221640230820943, 0.048739224765080275,
    -0.0681169523377421, 0.08974328889946132, -0.11378428952616813,
    0.14381484871790284, -0.19549081076627062, 0.3927120878848258,
)


def _erf_f32_cheb(x):
    """f32 erf as a transcendental-free odd polynomial (see above)."""
    ax = jnp.minimum(jnp.abs(x), _ERF_CHEB_B)
    u = ax * ax * (2.0 / (_ERF_CHEB_B * _ERF_CHEB_B)) - 1.0
    p = _ERF_CHEB_COEF[0]
    for c in _ERF_CHEB_COEF[1:]:
        p = p * u + c
    return jnp.where(jnp.abs(x) < _ERF_CHEB_B, x * p, jnp.sign(x))


_ERF_IMPLS = ("sig", "sig5", "rational", "cheb")


def _erf_impl() -> str:
    """Read + validate ``AIHAB_ERF_IMPL`` (default ``sig5`` since r5:
    the deg-5 sigmoid-poly form measured fastest at every ConvNeXt stage
    — s0 2.35 vs 2.51 ms/layer, e2e base_w A/B/A 52.9/54.1/53.5 — and
    its 5.3e-5 max GELU error is ~75x below bf16 resolution; every
    parity gate in tests/ passes under it).

    The value is read at TRACE time: set it before the first jit of any
    gelu_poly consumer — changing it after a function is compiled in this
    process has no effect (the compiled kernel is cached).  Unknown
    values raise instead of silently falling through to the rational
    path (ADVICE r4)."""
    import os

    impl = os.environ.get("AIHAB_ERF_IMPL", "sig5")
    if impl not in _ERF_IMPLS:
        raise ValueError(
            f"AIHAB_ERF_IMPL={impl!r} is not one of {_ERF_IMPLS} "
            "(note: read at trace time — set before the first compile)")
    return impl


def _erf_f32(x):
    if _erf_impl() == "cheb":
        return _erf_f32_cheb(x)
    return _erf_f32_rational(x)


# GELU(h) = h * sigmoid(f(h)) with f an odd degree-9 polynomial fitted so
# sigmoid(f) matches Phi(h) (IRLS minimax on |h|*|err|): max GELU abs
# error 3.4e-6 in f32, tails exact via the +-7.5 clamp (Phi(7.5) = 1 -
# 3e-14).  WHY: the fused-MLP kernels are activation-VPU-bound at
# large-spatial/narrow-channel shapes (ConvNeXt s0: act is ~2.3 of 3.0
# ms/layer), and on this VPU the transcendentals (exp, divide, logistic)
# are ~1-slot EUP ops — so VPU cost is OP COUNT, not transcendental
# count.  Measured ladder at s0 (ab_convnext_tiles, r4): quick_gelu
# (~4 slots) 1.98 ms, this form (~9 slots) expected ~2.2, A&S rational
# (~14 slots) 3.03, deg-14 Chebyshev Horner (~20 slots) 3.38 — the
# "transcendental-free" Chebyshev chain LOST to the rational it was
# meant to beat.
_GELU_SIG_COEF = (1.5956563, 0.07293758, -2.4972331e-4, -6.1162005e-5,
                  2.2381639e-6)

# Odd deg-5 variant (r5): two fewer FMA slots than the deg-9 form for a
# still-far-below-bf16 error — max GELU |err| 5.3e-5 f32 (vs deg-9's
# 3.4e-6; bf16 abs resolution at O(1) activations is ~4e-3, so both are
# invisible through bf16 towers).  IRLS-minimax fit of logistic(f) to
# Phi weighted by h*Phi*(1-Phi); tails via the +-7.5 clamp (f(7.5) ~ 27
# so sigmoid saturates to ~1e-12; the negative c5 flips f's sign past
# |h|~11, so the clamp IS load-bearing — any value in [5, 10] gives the
# same 5.3e-5 bound, the fit error inside the range).
_GELU_SIG5_COEF = (1.5953873, 0.07364605, -6.3791875e-4)


def _gelu_sig_f32(h):
    hc = jnp.clip(h, -7.5, 7.5)
    u = hc * hc
    c1, c3, c5, c7, c9 = _GELU_SIG_COEF
    f = hc * (c1 + u * (c3 + u * (c5 + u * (c7 + u * c9))))
    return h * jax.nn.sigmoid(f)


def _gelu_sig5_f32(h):
    hc = jnp.clip(h, -7.5, 7.5)
    u = hc * hc
    c1, c3, c5 = _GELU_SIG5_COEF
    f = hc * (c1 + u * (c3 + u * c5))
    return h * jax.nn.sigmoid(f)


def gelu_fast_f32(h):
    """In-kernel exact-GELU approximation (the 'gelu_poly' act).  Default
    is the deg-5 sigmoid-of-odd-poly form (~7 VPU slots, |err| <= 5.3e-5
    — r5, fastest measured at every ConvNeXt stage); ``AIHAB_ERF_IMPL``
    selects ``sig`` (deg-9, 3.4e-6), ``rational`` (A&S 7.1.26, ~4.6e-7)
    or ``cheb`` (deg-14 Chebyshev, ~3.6e-7) for A/B and as accuracy
    fallbacks — all far below bf16 resolution.  The env var is read at
    TRACE time and validated by ``_erf_impl`` — set it before the first
    compile in the process."""
    impl = _erf_impl()
    if impl == "sig":
        return _gelu_sig_f32(h)
    if impl == "sig5":
        return _gelu_sig5_f32(h)
    return 0.5 * h * (1.0 + _erf_f32(h * 0.7071067811865476))


def _act_f32(h, act: str):
    if act == "quick_gelu":
        return h * jax.nn.sigmoid(1.702 * h)
    if act == "gelu_tanh":
        return jax.nn.gelu(h, approximate=True)
    if act == "gelu":
        return jax.nn.gelu(h, approximate=False)
    if act == "gelu_poly":
        # exact-GELU via the in-kernel fast approximation (see above)
        return gelu_fast_f32(h)
    raise ValueError(f"unknown activation {act!r}")


def _mlp_split_chunk(ln2_f32, wfc_ref, bfc_ref, wpr_ref, *, act, cdt):
    """Shared chunk math: act(LN(x) @ Wfc_chunk + bfc_chunk) @ Wpr_chunk,
    GEMMs in ``cdt`` (the tower compute dtype) with fp32 accumulation."""
    h = jax.lax.dot(ln2_f32.astype(cdt), wfc_ref[:],
                    preferred_element_type=jnp.float32)
    h = _act_f32(h + bfc_ref[:][None, :], act)
    return jax.lax.dot(h.astype(cdt), wpr_ref[:],
                       preferred_element_type=jnp.float32)


def _mlp_split_first_kernel(x_ref, ln_s_ref, ln_b_ref, wfc_ref, bfc_ref,
                            wpr_ref, bpr_ref, o_ref, *, act: str,
                            cdt, ln_eps: float = 1e-5):
    """First hidden-dim chunk: out = x + b_proj + chunk(x).  No acc
    operand — the pre-split kernel DMA'd the x tile twice here (an unread
    placeholder); this variant saves that input traffic."""
    x = x_ref[:].astype(jnp.float32)                       # [TM, W]
    ln2 = _ln_f32(x, ln_s_ref[:], ln_b_ref[:], eps=ln_eps)
    part = _mlp_split_chunk(ln2, wfc_ref, bfc_ref, wpr_ref,
                            act=act, cdt=cdt)
    o_ref[:] = (part + bpr_ref[:][None, :] + x).astype(o_ref.dtype)


def _mlp_split_rest_kernel(x_ref, ln_s_ref, ln_b_ref, wfc_ref, bfc_ref,
                           wpr_ref, acc_ref, o_ref, *, act: str,
                           cdt, ln_eps: float = 1e-5):
    """Later chunks: out = acc + chunk(x).  LN(x) is recomputed per chunk
    (cheap VPU work) so only x and the [TM, W] partial cross HBM between
    chunks — never the [TM, hidden] activation.  b_proj already lives in
    the chunk-0 partial, so it is not an operand here."""
    x = x_ref[:].astype(jnp.float32)                       # [TM, W]
    ln2 = _ln_f32(x, ln_s_ref[:], ln_b_ref[:], eps=ln_eps)
    part = _mlp_split_chunk(ln2, wfc_ref, bfc_ref, wpr_ref,
                            act=act, cdt=cdt)
    o_ref[:] = (part + acc_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def mlp_block_split(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                    *, n_chunks: int = 2, act: str = "quick_gelu",
                    ln_eps: float = 1e-5, interpret: bool = False,
                    tile_m: int = 0, f32_partial: bool = False):
    """x: [M, W] -> x + c_proj(act(c_fc(LN(x)))), hidden dim split across
    ``n_chunks`` sequential kernels so each chunk's weight pair fits VMEM
    (towers whose full MLP pair exceeds the one-kernel budget: ViT-L,
    SigLIP SO400M).  Versus the per-op split path this never materializes
    the [M, hidden] activation in HBM — only the [M, W] running partial.

    ``f32_partial`` keeps that running partial in fp32 through HBM
    (removes one bf16 rounding per chunk boundary at the cost of 2x the
    inter-chunk traffic; GEMMs stay in the tower compute dtype either
    way).  Off by default pending a TPU accuracy/throughput A/B
    (tools_dev/ab_mlp_split.py)."""
    m, w = x.shape
    hidden = w_fc.shape[1]
    assert hidden % n_chunks == 0, (hidden, n_chunks)
    ch = hidden // n_chunks
    cdt = x.dtype  # GEMM compute dtype (independent of the partial dtype)
    part_dt = jnp.float32 if f32_partial else x.dtype
    if not tile_m:
        # 14 MiB: measured safe in-tower at ViT-L (tile 256 edged out 128,
        # 6.96 vs 6.99 ms/block); the one-kernel path keeps its stricter
        # 13 MiB budget.  Weight residency scales with the input dtype
        # (f32 doubles it).
        wbytes = jnp.dtype(x.dtype).itemsize * (w * ch + ch * w)
        budget = 14 * 1024 * 1024 - wbytes
        acc_extra = w * jnp.dtype(part_dt).itemsize * 2  # acc in + out tiles
        tile_m = 256 if 256 * (ch * 4 + w * 10 + acc_extra) <= budget else 128
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m
    xp = jnp.pad(x, ((0, m_pad - m), (0, 0))) if m_pad != m else x

    ln_scale = jnp.asarray(ln_scale, jnp.float32)
    ln_bias = jnp.asarray(ln_bias, jnp.float32)
    b_fc = jnp.asarray(b_fc, jnp.float32)
    b_proj = jnp.asarray(b_proj, jnp.float32)

    row_spec = pl.BlockSpec((tile_m, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_w = pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM)
    chunk_specs = [
        pl.BlockSpec((w, ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ch,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    acc = None
    for k in range(n_chunks):
        out_dt = x.dtype if k == n_chunks - 1 else part_dt
        chunk_w = (w_fc[:, k * ch:(k + 1) * ch], b_fc[k * ch:(k + 1) * ch],
                   w_proj[k * ch:(k + 1) * ch, :])
        if k == 0:
            acc = pl.pallas_call(
                partial(_mlp_split_first_kernel, act=act, cdt=cdt,
                        ln_eps=ln_eps),
                out_shape=jax.ShapeDtypeStruct((m_pad, w), out_dt),
                grid=(m_pad // tile_m,),
                in_specs=[row_spec, vec_w, vec_w, *chunk_specs, vec_w],
                out_specs=row_spec,
                interpret=interpret,
            )(xp, ln_scale, ln_bias, *chunk_w, b_proj)
        else:
            acc = pl.pallas_call(
                partial(_mlp_split_rest_kernel, act=act, cdt=cdt,
                        ln_eps=ln_eps),
                out_shape=jax.ShapeDtypeStruct((m_pad, w), out_dt),
                grid=(m_pad // tile_m,),
                in_specs=[row_spec, vec_w, vec_w, *chunk_specs, row_spec],
                out_specs=row_spec,
                interpret=interpret,
            )(xp, ln_scale, ln_bias, *chunk_w, acc)
    return acc[:m]


def _mlp_block_kernel(x_ref, ln_s_ref, ln_b_ref, wfc_ref, bfc_ref,
                      wpr_ref, bpr_ref, o_ref, *, act: str = "quick_gelu"):
    x = x_ref[:].astype(jnp.float32)                       # [TM, W]
    ln2 = _ln_f32(x, ln_s_ref[:], ln_b_ref[:])
    h = jax.lax.dot(ln2.astype(o_ref.dtype), wfc_ref[:],
                    preferred_element_type=jnp.float32)
    h = h + bfc_ref[:][None, :]
    h = _act_f32(h, act)
    out = jax.lax.dot(h.astype(o_ref.dtype), wpr_ref[:],
                      preferred_element_type=jnp.float32)
    out = out + bpr_ref[:][None, :] + x
    o_ref[:] = out.astype(o_ref.dtype)


def mlp_block_fused(x, ln_scale, ln_bias, w_fc, b_fc, w_proj, b_proj,
                    interpret: bool = False, tile_m: int = 0,
                    act: str = "quick_gelu"):
    """x: [M, W] -> x + c_proj(act(c_fc(LN(x)))). Row-tiled grid."""
    m, w = x.shape
    hidden = w_fc.shape[1]
    if not tile_m:
        # keep x + f32 hidden + out + both weights within ~14.5 MB
        # (256-row tiles measured faster than 128 at ViT-B — 5.20 vs 5.27
        # ms/block — and Mosaic's real liveness is below this naive
        # estimate; 384 measured slower, PERF_NOTES.md).  Weight residency
        # scales with the input dtype (f32 doubles it).
        wbytes = jnp.dtype(x.dtype).itemsize * (w * hidden + hidden * w)
        budget = int(14.5 * 1024 * 1024) - wbytes
        tile_m = 256 if 256 * (hidden * 4 + w * 8) <= budget else 128
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    out = pl.pallas_call(
        partial(_mlp_block_kernel, act=act),
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


def _convnext_mlp_kernel(y_ref, res_ref, ln_s_ref, ln_b_ref, w1_ref, b1_ref,
                         w2_ref, b2_ref, g_ref, o_ref, *, act: str,
                         ln_eps: float):
    """One ConvNeXt MLP sub-block on a row tile: LN(y) -> fc1 -> GELU ->
    fc2 -> gamma scale -> + residual, the [TM, 4C] hidden held in VMEM."""
    y = y_ref[:].astype(jnp.float32)                        # [TM, C]
    ln = _ln_f32(y, ln_s_ref[:], ln_b_ref[:], eps=ln_eps)
    h = jax.lax.dot(ln.astype(o_ref.dtype), w1_ref[:],
                    preferred_element_type=jnp.float32)
    h = _act_f32(h + b1_ref[:][None, :], act)
    out = jax.lax.dot(h.astype(o_ref.dtype), w2_ref[:],
                      preferred_element_type=jnp.float32)
    out = (out + b2_ref[:][None, :]) * g_ref[:][None, :]
    o_ref[:] = (res_ref[:].astype(jnp.float32) + out).astype(o_ref.dtype)


def _convnext_mlp_chunk_kernel(y_ref, acc_ref, ln_s_ref, ln_b_ref, w1_ref,
                               b1_ref, w2_ref, g_ref, o_ref, *, act: str,
                               ln_eps: float):
    """Later hidden-dim chunk: out = acc + gamma * chunk(y).  LN(y) is
    recomputed per chunk (VPU-cheap); only [TM, C] tensors cross HBM."""
    y = y_ref[:].astype(jnp.float32)
    ln = _ln_f32(y, ln_s_ref[:], ln_b_ref[:], eps=ln_eps)
    h = jax.lax.dot(ln.astype(o_ref.dtype), w1_ref[:],
                    preferred_element_type=jnp.float32)
    h = _act_f32(h + b1_ref[:][None, :], act)
    part = jax.lax.dot(h.astype(o_ref.dtype), w2_ref[:],
                       preferred_element_type=jnp.float32)
    o_ref[:] = (acc_ref[:].astype(jnp.float32)
                + part * g_ref[:][None, :]).astype(o_ref.dtype)


def convnext_mlp_block(y, residual, ln_scale, ln_bias, w1, b1, w2, b2,
                       gamma, *, act: str = "gelu_poly",
                       ln_eps: float = 1e-6, interpret: bool = False,
                       tile_m: int = 0, n_chunks: int = 0):
    """ConvNeXt block minus the depthwise conv, fused:
    ``residual + gamma * fc2(GELU(fc1(LN(y))))`` over [M, C] rows
    (y = dwconv output, residual = block input).

    The ConvNeXt MLP measured HBM-bound through XLA (17-34% effective
    MFU, BENCHMARKS.md "ConvNeXt-CLIP encode"): the [tokens, 4C] hidden
    round-trips HBM per block.  This is the ViT ``mlp_block_fused``
    structure with ConvNeXt's quirks — eps-1e-6 LN, exact GELU (via
    ``gelu_fast_f32``; Mosaic has no erf), layer-scale gamma, and a residual
    stream DISTINCT from the LN input.  Wide stages whose weight pair
    exceeds the one-kernel budget split the hidden dim across sequential
    kernels (the ``mlp_block_split`` recipe — gamma distributes over the
    chunk sum)."""
    m, c = y.shape
    hidden = w1.shape[1]
    wbytes = jnp.dtype(y.dtype).itemsize * (c * hidden + hidden * c)
    if not n_chunks:
        n_chunks = 1
        while wbytes // n_chunks > 10 * 1024 * 1024 and hidden % (
                n_chunks * 2) == 0:
            n_chunks *= 2
    if not tile_m:
        budget = int(14.5 * 1024 * 1024) - wbytes // n_chunks
        tile_m = 256 if 256 * (hidden // n_chunks * 4 + c * 10) <= budget \
            else 128
    m_pad = ((m + tile_m - 1) // tile_m) * tile_m
    if m_pad != m:
        y = jnp.pad(y, ((0, m_pad - m), (0, 0)))
        residual = jnp.pad(residual, ((0, m_pad - m), (0, 0)))

    ln_scale = jnp.asarray(ln_scale, jnp.float32)
    ln_bias = jnp.asarray(ln_bias, jnp.float32)
    b1 = jnp.asarray(b1, jnp.float32)
    b2 = jnp.asarray(b2, jnp.float32)
    gamma = jnp.asarray(gamma, jnp.float32)

    row_spec = pl.BlockSpec((tile_m, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)
    ch = hidden // n_chunks
    chunk_specs = [
        pl.BlockSpec((c, ch), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ch,), lambda i: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    acc = None
    for k in range(n_chunks):
        wk = (w1[:, k * ch:(k + 1) * ch], b1[k * ch:(k + 1) * ch],
              w2[k * ch:(k + 1) * ch, :])
        if k == 0:
            acc = pl.pallas_call(
                partial(_convnext_mlp_kernel, act=act, ln_eps=ln_eps),
                out_shape=jax.ShapeDtypeStruct((m_pad, c), y.dtype),
                grid=(m_pad // tile_m,),
                in_specs=[row_spec, row_spec, vec_c, vec_c, *chunk_specs,
                          vec_c, vec_c],
                out_specs=row_spec,
                interpret=interpret,
            )(y, residual, ln_scale, ln_bias, *wk, b2, gamma)
        else:
            acc = pl.pallas_call(
                partial(_convnext_mlp_chunk_kernel, act=act, ln_eps=ln_eps),
                out_shape=jax.ShapeDtypeStruct((m_pad, c), y.dtype),
                grid=(m_pad // tile_m,),
                in_specs=[row_spec, row_spec, vec_c, vec_c, chunk_specs[0],
                          chunk_specs[1], chunk_specs[2], vec_c],
                out_specs=row_spec,
                interpret=interpret,
            )(y, acc, ln_scale, ln_bias, *wk, gamma)
    return acc[:m]


# ---------------------------------------------------------------------------
# Head-group-SPLIT whole-block attention (bf16): for towers whose unsplit
# whole-block attention exceeds VMEM (SigLIP SO400M: S=736, W=1152)
# ---------------------------------------------------------------------------


def _attn_block_split_kernel(x_ref, ln_s_ref, ln_b_ref, wqkv_ref, bqkv_ref,
                             wout_ref, bout_ref, o_ref, ln_scr, acc_scr, *,
                             heads_per_group: int, seq_len: int,
                             head_dim: int, n_groups: int,
                             ln_eps: float = 1e-5):
    """Grid (image, head_group), head_group minor.  Each program computes
    ``heads_per_group`` heads' QKV + attention + out-proj PARTIAL into an
    f32 VMEM scratch accumulator; the output block is written once at the
    last group.  LN(x) is computed once per image (group 0) and persisted
    in scratch (scratch survives grid steps on TPU).  Same structure as
    the int8 variant (``ops/quant_matmul._attn_block_split_kernel``)
    minus the quantize/dequant steps."""
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
        ln_scr[:] = ln1.astype(ln_scr.dtype)

    qkv = jax.lax.dot(ln_scr[:], wqkv_ref[0],
                      preferred_element_type=jnp.float32)  # [S, 3*g*D]
    qkv = qkv + bqkv_ref[0, 0][None, :]

    scale = 1.0 / math.sqrt(head_dim)
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_ok = col < seq_len
    gw = g * head_dim
    outs = []
    for h in range(g):
        q = qkv[:, h * head_dim:(h + 1) * head_dim] * scale
        k = qkv[:, gw + h * head_dim:gw + (h + 1) * head_dim]
        v = qkv[:, 2 * gw + h * head_dim:2 * gw + (h + 1) * head_dim]
        s = jax.lax.dot_general(q.astype(o_ref.dtype), k.astype(o_ref.dtype),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(key_ok, s, jnp.float32(-1e30))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jax.lax.dot(p.astype(o_ref.dtype), v.astype(o_ref.dtype),
                                preferred_element_type=jnp.float32))
    attn = jnp.concatenate(outs, axis=-1)                 # [S, g*D] f32
    part = jax.lax.dot(attn.astype(o_ref.dtype), wout_ref[0],
                       preferred_element_type=jnp.float32)  # [S, W]

    @pl.when(hg == 0)
    def _():
        acc_scr[:] = part + bout_ref[:][None, :] + x_ref[0].astype(jnp.float32)

    @pl.when(hg > 0)
    def _():
        acc_scr[:] = acc_scr[:] + part

    @pl.when(hg == n_groups - 1)
    def _():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


def attn_block_split(x, wqkv_g, b_qkv_g, wout_g, b_out, ln_scale, ln_bias,
                     heads: int, n_groups: int, ln_eps: float = 1e-5,
                     interpret: bool = False, padded_io: bool = False,
                     seq_len: int | None = None):
    """Head-group-split whole-block attention (bf16).

    ``wqkv_g`` [n_groups, W, 3*g*D], ``b_qkv_g`` [n_groups, 3*g*D],
    ``wout_g`` [n_groups, g*D, W] — use ``regroup_attn_weights_f`` to
    build these from a packed [W, 3W] QKV and [W, W] out-proj.
    ``padded_io``/``seq_len``: see ``attn_block_fused``."""
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
            pl.BlockSpec((1, 1, gcols), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g * head_dim, w), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s_pad, w), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s_pad, w), x.dtype),
                        pltpu.VMEM((s_pad, w), jnp.float32)],
        interpret=interpret,
    )(x, jnp.asarray(ln_scale, jnp.float32), jnp.asarray(ln_bias, jnp.float32),
      wqkv_g, jnp.asarray(b_qkv_g, jnp.float32)[:, None, :],
      wout_g, jnp.asarray(b_out, jnp.float32))
    return out if padded_io else out[:, :s, :]


# ---------------------------------------------------------------------------
# Merged FULL-block kernel: attention half + MLP half in ONE program per
# image — the residual stream never leaves VMEM inside a block
# ---------------------------------------------------------------------------


def _mha_f32(qkv, heads, head_dim, width, seq_len, s_pad, cdt,
             attn_impl: str):
    """Multi-head attention core on a [S, 3W] f32 QKV tile -> [S, W] f32.

    ``attn_impl`` selects between measured A/B variants (see PERF_NOTES
    "ViT-B attention core"):
      * ``base``      — per-head GEMMs, normalized P (r1 dispatch).
      * ``foldnorm``  — per-head GEMMs, 1/sum folded into the PV OUTPUT
        rows: divides [S, D] instead of [S, S] (exact same math —
        (P/sum)@V == (P@V)/sum row-wise).
      * ``pair``      — two heads per GEMM pair via block-diagonal K/V:
        full-rate K=128/N=128 GEMMs (vs half-rate K=64/N=64) and half
        the softmax instruction streams; MXU MAC count is identical by
        algebra (zero blocks double the nominal FLOPs exactly as much
        as the half-rate penalty), so this measures pass overheads.
        Implies foldnorm.
      * ``batched``   — single batched-head dot_general ([H, S, D]
        operands); the r1 attempt was a Mosaic compile crash, kept as a
        probe for toolchain updates.
    """
    scale = 1.0 / math.sqrt(head_dim)
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_ok = col < seq_len

    if attn_impl == "batched":
        q = qkv[:, :width].reshape(s_pad, heads, head_dim)
        k = qkv[:, width:2 * width].reshape(s_pad, heads, head_dim)
        v = qkv[:, 2 * width:].reshape(s_pad, heads, head_dim)
        q = jnp.swapaxes(q, 0, 1) * scale            # [H, S, D]
        k = jnp.swapaxes(k, 0, 1)
        v = jnp.swapaxes(v, 0, 1)
        s = jax.lax.dot_general(q.astype(cdt), k.astype(cdt),
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = jnp.where(key_ok[None], s, jnp.float32(-1e30))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(cdt), v.astype(cdt),
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o * r
        return jnp.swapaxes(o, 0, 1).reshape(s_pad, width)

    if attn_impl == "pair":
        assert heads % 2 == 0, heads
        zeros_sd = jnp.zeros((s_pad, head_dim), jnp.float32)
        key_ok2 = jnp.concatenate([key_ok, key_ok], axis=1)
        outs = []
        for i in range(heads // 2):
            h0, h1 = 2 * i, 2 * i + 1
            sl0 = slice(h0 * head_dim, (h0 + 1) * head_dim)
            sl1 = slice(h1 * head_dim, (h1 + 1) * head_dim)
            q2 = jnp.concatenate(
                [qkv[:, sl0], qkv[:, sl1]], axis=1) * scale  # [S, 2D]
            k0 = qkv[:, width + h0 * head_dim:width + (h0 + 1) * head_dim]
            k1 = qkv[:, width + h1 * head_dim:width + (h1 + 1) * head_dim]
            v0 = qkv[:, 2 * width + h0 * head_dim:
                     2 * width + (h0 + 1) * head_dim]
            v1 = qkv[:, 2 * width + h1 * head_dim:
                     2 * width + (h1 + 1) * head_dim]
            kb = jnp.concatenate([                       # [2S, 2D] blockdiag
                jnp.concatenate([k0, zeros_sd], axis=1),
                jnp.concatenate([zeros_sd, k1], axis=1)], axis=0)
            s2 = jax.lax.dot_general(q2.astype(cdt), kb.astype(cdt),
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            s2 = jnp.where(key_ok2, s2, jnp.float32(-1e30))  # [S, 2S]
            s3 = s2.reshape(s_pad, 2, s_pad)
            m = jnp.max(s3, axis=-1, keepdims=True)
            p = jnp.exp(s3 - m)
            r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)   # [S, 2, 1]
            vb = jnp.concatenate([                       # [2S, 2D] blockdiag
                jnp.concatenate([v0, zeros_sd], axis=1),
                jnp.concatenate([zeros_sd, v1], axis=1)], axis=0)
            o2 = jax.lax.dot(p.reshape(s_pad, 2 * s_pad).astype(cdt),
                             vb.astype(cdt),
                             preferred_element_type=jnp.float32)
            o2 = (o2.reshape(s_pad, 2, head_dim) * r).reshape(
                s_pad, 2 * head_dim)
            outs.append(o2)
        return jnp.concatenate(outs, axis=-1)

    fold = attn_impl == "foldnorm"
    outs = []
    for h in range(heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim] * scale
        k = qkv[:, width + h * head_dim:width + (h + 1) * head_dim]
        v = qkv[:, 2 * width + h * head_dim:2 * width + (h + 1) * head_dim]
        s = jax.lax.dot_general(q.astype(cdt), k.astype(cdt),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(key_ok, s, jnp.float32(-1e30))
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        if fold:
            r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(cdt), v.astype(cdt),
                            preferred_element_type=jnp.float32) * r
        else:
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot(p.astype(cdt), v.astype(cdt),
                            preferred_element_type=jnp.float32)
        outs.append(o)
    return jnp.concatenate(outs, axis=-1)


def _full_block_kernel(x_ref, ln1_s_ref, ln1_b_ref, wqkv_ref, bqkv_ref,
                       wout_ref, bout_ref, ln2_s_ref, ln2_b_ref,
                       wfc_ref, bfc_ref, wpr_ref, bpr_ref, o_ref, *,
                       heads: int, seq_len: int, mlp_chunks: int,
                       act: str, attn_impl: str = "base",
                       ln_eps: float = 1e-5):
    """One grid program per image GROUP computes the ENTIRE transformer
    block: LN1 -> QKV -> MHA -> out-proj -> +residual -> LN2 -> c_fc ->
    act -> c_proj -> +residual.  Versus the two-kernel dispatch this
    removes the inter-half [B, S, W] HBM round-trip and the pipeline
    drain between the two pallas_calls.  The MLP hidden dim is processed
    in ``mlp_chunks`` sequential slices to bound the f32 hidden tile's
    VMEM liveness (the weights are whole either way — residency is what
    it is).  Blocks x/o are [G, S_pad, W]: short-sequence towers
    (ViT-B/32: S_pad=64) run G images per program so every GEMM sees
    G*S_pad rows instead of an under-filled 64-row M tile; the attention
    core loops (image, head) as in ``_attn_block_kernel``."""
    n_img, s_pad, width = x_ref.shape
    head_dim = width // heads
    cdt = o_ref.dtype                                     # GEMM compute dtype
    x = x_ref[:].astype(jnp.float32).reshape(n_img * s_pad, width)

    # ---- attention half (QKV/out GEMMs on the G*S row stack)
    ln1 = _ln_f32(x, ln1_s_ref[:], ln1_b_ref[:], eps=ln_eps)
    qkv = jax.lax.dot(ln1.astype(cdt), wqkv_ref[:],
                      preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:][None, :]                      # [G*S, 3W] f32
    if n_img == 1:
        attn = _mha_f32(qkv, heads, head_dim, width, seq_len, s_pad, cdt,
                        attn_impl)                        # [S, W] f32
    else:
        attn = jnp.concatenate([
            _mha_f32(qkv[g * s_pad:(g + 1) * s_pad], heads, head_dim,
                     width, seq_len, s_pad, cdt, attn_impl)
            for g in range(n_img)], axis=0)               # [G*S, W] f32
    y1 = jax.lax.dot(attn.astype(cdt), wout_ref[:],
                     preferred_element_type=jnp.float32)
    y1 = y1 + bout_ref[:][None, :] + x                    # residual stream

    # ---- MLP half (hidden dim chunked to bound f32 tile liveness)
    ln2 = _ln_f32(y1, ln2_s_ref[:], ln2_b_ref[:], eps=ln_eps)
    hidden = wfc_ref.shape[1]
    ch = hidden // mlp_chunks
    acc = y1 + bpr_ref[:][None, :]
    for c in range(mlp_chunks):
        h = jax.lax.dot(ln2.astype(cdt), wfc_ref[:, c * ch:(c + 1) * ch],
                        preferred_element_type=jnp.float32)
        h = _act_f32(h + bfc_ref[c * ch:(c + 1) * ch][None, :], act)
        acc = acc + jax.lax.dot(h.astype(cdt), wpr_ref[c * ch:(c + 1) * ch, :],
                                preferred_element_type=jnp.float32)
    o_ref[:] = acc.reshape(n_img, s_pad, width).astype(o_ref.dtype)


def full_block_fused(x, ln1_scale, ln1_bias, w_qkv, b_qkv, w_out, b_out,
                     ln2_scale, ln2_bias, w_fc, b_fc, w_proj, b_proj,
                     heads: int, *, mlp_chunks: int = 2,
                     act: str = "quick_gelu", attn_impl: str = "base",
                     vmem_limit_mb: int = 0, interpret: bool = False,
                     images_per_program: int = 1):
    """x: [B, S, W] -> full transformer block in one Pallas program per
    image (group).  All weights (~14 MB bf16 at ViT-B) stay VMEM-resident
    across the grid — only viable where the QKV/out/MLP weight set plus
    the per-image working set fits the chip's VMEM; caller A/Bs against
    the two-kernel dispatch.  ``images_per_program`` > 1 batches G images
    into one program so short-sequence towers (ViT-B/32: S_pad=64) fill
    the GEMM M tiles; falls back to 1 when it does not divide the
    batch."""
    b, s, w = x.shape
    hidden = w_fc.shape[1]
    assert hidden % mlp_chunks == 0, (hidden, mlp_chunks)
    g = images_per_program if images_per_program > 0 else 1
    while g > 1 and b % g:
        g //= 2          # largest power-of-two divisor <= requested
    s_pad = ((s + 15) // 16) * 16
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
    kwargs = {}
    if vmem_limit_mb:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024)
    out = pl.pallas_call(
        partial(_full_block_kernel, heads=heads, seq_len=s,
                mlp_chunks=mlp_chunks, act=act, attn_impl=attn_impl),
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
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, hidden), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, s_pad, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        **kwargs,
    )(x, jnp.asarray(ln1_scale, jnp.float32),
      jnp.asarray(ln1_bias, jnp.float32),
      w_qkv, jnp.asarray(b_qkv, jnp.float32),
      w_out, jnp.asarray(b_out, jnp.float32),
      jnp.asarray(ln2_scale, jnp.float32),
      jnp.asarray(ln2_bias, jnp.float32),
      w_fc, jnp.asarray(b_fc, jnp.float32),
      w_proj, jnp.asarray(b_proj, jnp.float32))
    return out[:, :s, :]


def regroup_attn_weights_f(wqkv, b_qkv, wout, heads: int, n_groups: int):
    """Packed [W, 3W] q|k|v + [W, W] out-proj -> per-head-group tensors
    for ``attn_block_split`` (float/bf16 counterpart of the int8
    ``quant_matmul.regroup_attn_weights``)."""
    assert heads % n_groups == 0, (heads, n_groups)
    w = wqkv.shape[0]
    head_dim = w // heads
    g = heads // n_groups
    q_sec, k_sec, v_sec = jnp.split(wqkv, 3, axis=1)
    b_secs = jnp.split(jnp.asarray(b_qkv, jnp.float32), 3)
    wq_pieces, b_pieces, wo_pieces = [], [], []
    for ng in range(n_groups):
        sl = slice(ng * g * head_dim, (ng + 1) * g * head_dim)
        wq_pieces.append(jnp.concatenate(
            [q_sec[:, sl], k_sec[:, sl], v_sec[:, sl]], axis=1))
        b_pieces.append(jnp.concatenate([bs[sl] for bs in b_secs]))
        wo_pieces.append(wout[sl, :])
    return (jnp.stack(wq_pieces, 0), jnp.stack(b_pieces, 0),
            jnp.stack(wo_pieces, 0))
