"""Fused attention kernel (interpret mode) vs XLA attention + VJP path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aihab_clip_tpu.ops.attention import (
    _pallas_attention,
    _xla_attention,
    attention,
    fused_attention,
)


def _qkv(rng, b=2, s=197, w=128):
    return tuple(jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
                 for _ in range(3))


@pytest.mark.parametrize("s", [64, 197, 128])
def test_pallas_matches_xla(rng, s):
    q, k, v = _qkv(rng, s=s)
    ref = _xla_attention(q, k, v, 2)
    out = _pallas_attention(q, k, v, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_padding_mask_excludes_tail(rng):
    """Padded key columns must not contribute: results for S=100 equal the
    first 100 rows of an S=128 run with zeroed tail only if masked."""
    q, k, v = _qkv(rng, s=100)
    ref = _xla_attention(q, k, v, 2)
    out = _pallas_attention(q, k, v, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_vjp_matches_xla_grad(rng):
    q, k, v = _qkv(rng, b=1, s=64)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, 2) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, 2) ** 2)

    # on CPU the fused forward runs the pallas interpret path only via
    # explicit interpret=True; instead check the custom VJP wiring by
    # comparing backward at matching primals through the dispatcher
    g1 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    # attention() dispatches to XLA off-TPU: gradients flow normally
    g2 = jax.grad(lambda q, k, v: jnp.sum(
        attention(q, k, v, 2) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("s", [64, 100, 197])
def test_pallas_bwd_kernel_matches_xla_grad(rng, s):
    """The Pallas backward kernel (interpret mode) must reproduce the XLA
    attention gradients, including with padded key columns (s=100, 197
    pad to 112, 208)."""
    q, k, v = _qkv(rng, b=2, s=s)
    gct = jnp.asarray(
        np.random.default_rng(7).standard_normal(q.shape).astype(np.float32))

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, 2) * gct)

    ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)

    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, 2, True) * gct)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_pallas_bwd_head_grouping_invariant(rng):
    """dq/dk/dv must not depend on the head-group size."""
    from aihab_clip_tpu.ops.attention import _pallas_attention_bwd

    q, k, v = _qkv(rng, b=1, s=64, w=256)  # 4 heads of 64
    gct = jnp.asarray(
        np.random.default_rng(3).standard_normal(q.shape).astype(np.float32))
    outs = [_pallas_attention_bwd(q, k, v, gct, 4, interpret=True,
                                  heads_per_program=hpp)
            for hpp in (1, 2, 4)]
    for other in outs[1:]:
        for a, b in zip(outs[0], other):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)


def test_xla_attention_dispatch_context(rng, monkeypatch):
    """Inside xla_attention_dispatch() the auto dispatch must avoid the
    Pallas kernel even when the TPU crossover conditions hold; explicit
    use_fused=True still wins."""
    import aihab_clip_tpu.ops.attention as A

    q, k, v = _qkv(rng, b=1, s=16, w=64)
    monkeypatch.setattr(A, "dispatch_backend", lambda: "tpu")
    monkeypatch.setattr(A, "FUSED_MIN_SEQ", 1)
    calls = []
    monkeypatch.setattr(
        A, "fused_attention",
        lambda q, k, v, h, i=False: calls.append(1) or A._xla_attention(
            q, k, v, h))
    A.attention(q, k, v, 2)
    assert calls == [1]
    with A.xla_attention_dispatch():
        A.attention(q, k, v, 2)
        assert calls == [1]            # auto dispatch took the XLA path
        A.attention(q, k, v, 2, use_fused=True)
        assert calls == [1, 1]         # explicit force still honored
    A.attention(q, k, v, 2)
    assert calls == [1, 1, 1]          # context restored


def test_bwd_vmem_gate():
    """The backward kernel is gated off where its VMEM working set cannot
    fit (long sequences), and on at the known-good SigLIP-384 shape."""
    from aihab_clip_tpu.ops.attention import _bwd_kernel_fits_vmem

    assert _bwd_kernel_fits_vmem(729, 16, 72, 2)       # SigLIP SO400M @384
    assert _bwd_kernel_fits_vmem(577, 16, 64, 2)       # ViT-L @336
    assert not _bwd_kernel_fits_vmem(1024, 16, 72, 2)  # hypothetical @512


def test_attention_dispatch_causal_matches(rng):
    q, k, v = _qkv(rng, b=1, s=32)
    out = attention(q, k, v, 2, causal=True)
    b, s, w = q.shape
    ref = jax.nn.dot_product_attention(
        q.reshape(b, s, 2, w // 2), k.reshape(b, s, 2, w // 2),
        v.reshape(b, s, 2, w // 2), is_causal=True).reshape(b, s, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
