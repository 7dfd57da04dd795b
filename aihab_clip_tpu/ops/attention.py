"""Fused short-sequence attention (Pallas TPU kernel).

One grid program per (image, head) computes scores, masked softmax, and
the value contraction entirely in VMEM.

Measured reality on v5e:
  * ViT-B/16 shapes (S=197, batch 256): XLA wins — 2.5 ms vs 4.4 ms for
    this kernel (the per-(image, head) grid under-utilizes the MXU at
    D=64, and the score tensor is still small).
  * SigLIP-384 shapes (S=729, H=16, batch 64, bf16): this kernel wins
    1.74x — 4.19 ms (head-batched, g=4) vs 7.29 ms for XLA — because XLA
    materializes the [B, H, S, S] scores in HBM and that traffic
    dominates.  GEMMs run in the input dtype (bf16 fast path) with fp32
    accumulation; softmax stays fp32.
The dispatcher therefore selects the kernel for non-causal sequences of
>= 512 tokens on TPU and XLA below that.

Backward: ``fused_attention`` carries a custom VJP backed by a second
Pallas kernel (``_attn_bwd_kernel``): one program per (image,
head-group) recomputes the masked softmax in VMEM from the saved q/k/v
(flash-style — no [B, H, S, S] probability tensor is saved to or read
from HBM) and emits dq/dk/dv in the same pass.  Off-TPU the backward
falls back to differentiating the plain XLA formulation.
"""

from __future__ import annotations

import contextlib
import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..backend import dispatch_backend


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int,
                 head_dim: int, interpret: bool = False):
    """Blocks: q/k/v/o [1, G, S_pad, D] — one image, G heads per program.

    Matmuls run in the INPUT dtype with fp32 accumulation (the MXU's
    native bf16 path; an all-fp32 variant measured ~2x slower at
    SigLIP-384 shapes); the softmax stays fp32, and the probabilities are
    cast back to the value dtype for the PV contraction — the same
    precision scheme XLA's fused attention uses."""
    g = q_ref.shape[1]
    s_pad = q_ref.shape[2]
    scale = jnp.float32(1.0 / math.sqrt(head_dim))
    # key-padding mask: columns >= seq_len contribute -inf scores
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_ok = col < seq_len
    for gi in range(g):  # unrolled; compiler reuses the score buffers
        q = q_ref[0, gi]
        k = k_ref[0, gi]
        v = v_ref[0, gi]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [S, S] fp32
        scores = jnp.where(key_ok, scores, jnp.float32(-1e30))
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        o_ref[0, gi] = out.astype(o_ref.dtype)


def _heads_per_program(num_heads: int, s_pad: int, head_dim: int,
                       itemsize: int) -> int:
    """Head-group size whose q/k/v/o blocks stay within a VMEM budget
    (score temporaries are reused across the unrolled heads).  Measured at
    SigLIP-384 shapes (B=64, H=16, S=729, D=72, bf16, v5e):
    g=1: 4.72 ms, g=2: 4.45, g=4: 4.19 (best; 1.74x over XLA's 7.29),
    g=8: 4.29 — so the search is capped at 4."""
    budget = 4 * 1024 * 1024  # bytes for the 4 blocks, pre double-buffering
    for g in (4, 2, 1):
        if num_heads % g:
            continue
        if 4 * g * s_pad * head_dim * itemsize <= budget:
            return g
    return 1


def _pallas_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                      num_heads: int, interpret: bool = False,
                      heads_per_program: int | None = None) -> jax.Array:
    """q/k/v: [B, S, W] (heads packed in W). Returns [B, S, W]."""
    b, s, w = q.shape
    head_dim = w // num_heads
    # 16-multiple (bf16 sublane) padding, not 128: Mosaic handles non-128
    # minor dims, and 729->736 instead of 768 measured 4.14 vs 4.67 ms at
    # SigLIP-384 shapes (PERF_NOTES.md)
    s_pad = _round_up(s, 16)
    if heads_per_program is None:
        heads_per_program = _heads_per_program(num_heads, s_pad, head_dim,
                                               q.dtype.itemsize)
    g = heads_per_program

    def split(t):
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0)))
        # [B, S_pad, H, D] -> [B, H, S_pad, D]
        return t.reshape(b, s_pad, num_heads, head_dim).transpose(0, 2, 1, 3)

    q4, k4, v4 = split(q), split(k), split(v)
    out = pl.pallas_call(
        partial(_attn_kernel, seq_len=s, head_dim=head_dim),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, s_pad, head_dim),
                                       q.dtype),
        grid=(b, num_heads // g),
        in_specs=[pl.BlockSpec((1, g, s_pad, head_dim),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, g, s_pad, head_dim),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q4, k4, v4)
    # [B, H, S_pad, D] -> [B, S, W]
    return out.transpose(0, 2, 1, 3)[:, :s, :].reshape(b, s, w)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                     *, seq_len: int, head_dim: int):
    """Blocks: all [1, G, S_pad, D].  Recomputes the masked softmax from
    q/k (same fp32 scheme as the forward) and emits all three input
    gradients; the [S, S] temporaries (scores, p, dp, ds) live only in
    VMEM and are reused across the unrolled head iterations.

    Padded QUERY rows carry zero cotangents (the caller zero-pads g), so
    their contributions vanish; padded KEY columns have p ~ 0 through the
    -1e30 score mask, which zeroes their ds/dk/dv in turn."""
    g_heads = q_ref.shape[1]
    s_pad = q_ref.shape[2]
    scale = jnp.float32(1.0 / math.sqrt(head_dim))
    col = jax.lax.broadcasted_iota(jnp.int32, (s_pad, s_pad), 1)
    key_ok = col < seq_len
    for gi in range(g_heads):
        q = q_ref[0, gi]
        k = k_ref[0, gi]
        v = v_ref[0, gi]
        dout = g_ref[0, gi]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale      # [S, S] fp32
        scores = jnp.where(key_ok, scores, jnp.float32(-1e30))
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)           # fp32
        pb = p.astype(v.dtype)
        # dv = p^T @ g   (contract the query axis)
        dv = jax.lax.dot_general(pb, dout, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dv_ref[0, gi] = dv.astype(dv_ref.dtype)
        # dp = g @ v^T ; ds = p * (dp - rowsum(dp * p)) * scale
        dp = jax.lax.dot_general(dout, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
              * scale).astype(q.dtype)
        dq = jax.lax.dot(ds, k, preferred_element_type=jnp.float32)
        dq_ref[0, gi] = dq.astype(dq_ref.dtype)
        dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk_ref[0, gi] = dk.astype(dk_ref.dtype)


def _bwd_heads_per_program(num_heads: int, s_pad: int, head_dim: int,
                           itemsize: int) -> int:
    """The backward program moves 7 blocks (q/k/v/g in, dq/dk/dv out) and
    holds ~4 [S_pad, S_pad] fp32 temporaries, so its head-group budget is
    tighter than the forward's; capped at 2 (4 exceeds VMEM next to the
    temporaries at SigLIP-384 shapes)."""
    budget = 2 * 1024 * 1024  # bytes for the 7 blocks, pre double-buffering
    for g in (2, 1):
        if num_heads % g:
            continue
        if 7 * g * s_pad * head_dim * itemsize <= budget:
            return g
    return 1


def _bwd_kernel_fits_vmem(s: int, num_heads: int, head_dim: int,
                          itemsize: int) -> bool:
    """Whether the backward program's working set fits VMEM: unlike the
    forward (one [S, S] fp32 score matrix), the backward holds ~4 fp32
    [S_pad, S_pad] temporaries (scores/p, dp, ds and a bf16 copy) next to
    its 7 double-buffered blocks — at S > ~900 that overflows the ~16 MB
    physical budget even at one head per program, so the custom VJP falls
    back to differentiating the XLA formulation there."""
    s_pad = _round_up(s, 16)
    g = _bwd_heads_per_program(num_heads, s_pad, head_dim, itemsize)
    temporaries = 4 * s_pad * s_pad * 4
    blocks = 2 * 7 * g * s_pad * head_dim * itemsize  # double-buffered
    return temporaries + blocks <= 13 * 1024 * 1024


def _pallas_attention_bwd(q: jax.Array, k: jax.Array, v: jax.Array,
                          g: jax.Array, num_heads: int,
                          interpret: bool = False,
                          heads_per_program: int | None = None):
    """VJP of ``_pallas_attention`` w.r.t. (q, k, v); g is the output
    cotangent, all [B, S, W]."""
    b, s, w = q.shape
    head_dim = w // num_heads
    s_pad = _round_up(s, 16)
    if heads_per_program is None:
        heads_per_program = _bwd_heads_per_program(
            num_heads, s_pad, head_dim, q.dtype.itemsize)
    hpp = heads_per_program

    def split(t):
        if s_pad != s:
            t = jnp.pad(t, ((0, 0), (0, s_pad - s), (0, 0)))
        return t.reshape(b, s_pad, num_heads, head_dim).transpose(0, 2, 1, 3)

    spec = pl.BlockSpec((1, hpp, s_pad, head_dim), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((b, num_heads, s_pad, head_dim), q.dtype)
    dq, dk, dv = pl.pallas_call(
        partial(_attn_bwd_kernel, seq_len=s, head_dim=head_dim),
        out_shape=(shape, shape, shape),
        grid=(b, num_heads // hpp),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        interpret=interpret,
    )(split(q), split(k), split(v), split(g))

    def merge(t):
        return t.transpose(0, 2, 1, 3)[:, :s, :].reshape(b, s, w)

    return merge(dq), merge(dk), merge(dv)


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   num_heads: int) -> jax.Array:
    b, s, w = q.shape
    head_dim = w // num_heads

    def heads(t):
        return t.reshape(b, s, num_heads, head_dim)

    out = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
    return out.reshape(b, s, w)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q, k, v, num_heads: int, interpret: bool = False):
    """Fused multi-head attention over packed-head inputs [B, S, W]."""
    return _pallas_attention(q, k, v, num_heads, interpret=interpret)


def _fused_fwd(q, k, v, num_heads, interpret):
    return _pallas_attention(q, k, v, num_heads, interpret=interpret), \
        (q, k, v)


def _fused_bwd(num_heads, interpret, res, g):
    q, k, v = res
    fits = _bwd_kernel_fits_vmem(q.shape[1], num_heads,
                                 q.shape[2] // num_heads, q.dtype.itemsize)
    if (dispatch_backend() == "tpu" or interpret) and fits:
        return _pallas_attention_bwd(q, k, v, g, num_heads,
                                     interpret=interpret)
    _, vjp = jax.vjp(lambda q, k, v: _xla_attention(q, k, v, num_heads),
                     q, k, v)
    return vjp(g)


fused_attention.defvjp(_fused_fwd, _fused_bwd)


# below this sequence length XLA's attention is faster than the kernel
# (measured crossover between 197 and 729 tokens on v5e)
FUSED_MIN_SEQ = 512

# trace-time override depth for xla_attention_dispatch()
_XLA_ONLY_DEPTH = [0]


@contextlib.contextmanager
def xla_attention_dispatch():
    """Force ``attention()``'s AUTO dispatch onto the plain XLA path for
    code traced inside this context (explicit ``use_fused=True`` still
    wins).  For GSPMD/mesh-partitioned programs: a ``pallas_call`` is
    opaque to the partitioner, so the fused kernel (forward AND custom-VJP
    backward) would force its operands to gather/replicate across the
    mesh — mesh-aware step builders wrap their jitted steps in this
    context so the partitionable XLA attention is baked in at trace
    time."""
    _XLA_ONLY_DEPTH[0] += 1
    try:
        yield
    finally:
        _XLA_ONLY_DEPTH[0] -= 1


def attention(q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int,
              *, causal: bool = False,
              use_fused: bool | None = None) -> jax.Array:
    """Dispatch by measured crossover: the Pallas kernel for non-causal
    sequences >= FUSED_MIN_SEQ tokens on TPU, XLA otherwise.

    ``use_fused=False`` always forces the XLA path.  ``use_fused=True``
    forces the kernel (overriding the FUSED_MIN_SEQ and S<=1536 perf
    heuristics) and RAISES where the kernel genuinely cannot run (causal
    masking, non-TPU backend) — silently measuring the other path would
    invalidate any A/B the force flag exists for."""
    forced = use_fused is True
    if use_fused is None:
        # auto: measured crossover, honoring xla_attention_dispatch();
        # upper cap because the kernel materializes one [S_pad, S_pad]
        # f32 score matrix per program — past ~1500 tokens that alone
        # exceeds VMEM
        use_fused = (FUSED_MIN_SEQ <= q.shape[1] <= 1536
                     and not _XLA_ONLY_DEPTH[0])
    if forced and (causal or dispatch_backend() != "tpu"):
        raise ValueError(
            "use_fused=True cannot be honored: the fused kernel is "
            f"non-causal TPU-only (causal={causal}, "
            f"backend={dispatch_backend()!r})")
    if use_fused and not causal and dispatch_backend() == "tpu":
        return fused_attention(q, k, v, num_heads, False)
    b, s, w = q.shape
    head_dim = w // num_heads

    def heads(t):
        return t.reshape(b, s, num_heads, head_dim)

    out = jax.nn.dot_product_attention(heads(q), heads(k), heads(v),
                                       is_causal=causal)
    return out.reshape(b, s, w)
