"""Fused linear kernels (interpret mode): both grid variants vs XLA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import aihab_clip_tpu.ops.fused_linear as fl
from aihab_clip_tpu.ops.fused_linear import (
    _ln_matmul_pallas,
    _ln_matmul_xla,
    _matmul_residual_pallas,
    _matmul_residual_xla,
    ln_matmul,
    matmul_residual,
)


def _case(rng, m, k, n):
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.standard_normal((n,)).astype(np.float32))
    ls = jnp.asarray(rng.standard_normal((k,)).astype(np.float32))
    lb = jnp.asarray(rng.standard_normal((k,)).astype(np.float32))
    res = jnp.asarray(rng.standard_normal((m, n)).astype(np.float32))
    return x, w, b, ls, lb, res


@pytest.mark.parametrize("shape", [(197, 96, 256), (300, 128, 384),
                                   (100, 64, 200)])
@pytest.mark.parametrize("full_n", [True, False])
def test_ln_matmul_variants(rng, shape, full_n, monkeypatch):
    monkeypatch.setattr(fl, "_FULLN_WEIGHT_BYTES",
                        10 * 1024 * 1024 if full_n else 0)
    x, w, b, ls, lb, _ = _case(rng, *shape)
    for act, eps in ((None, 1e-5), ("quick_gelu", 1e-5),
                     ("gelu_tanh", 1e-6)):
        out = _ln_matmul_pallas(x, ls, lb, w, b, act, eps, interpret=True)
        ref = _ln_matmul_xla(x, ls, lb, w, b, act, eps)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4)


@pytest.mark.parametrize("full_n", [True, False])
def test_matmul_residual_variants(rng, full_n, monkeypatch):
    monkeypatch.setattr(fl, "_FULLN_WEIGHT_BYTES",
                        10 * 1024 * 1024 if full_n else 0)
    x, w, b, _, _, res = _case(rng, 197, 96, 256)
    out = _matmul_residual_pallas(x, w, b, res, interpret=True)
    ref = _matmul_residual_xla(x, w, b, res)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_custom_vjp_grads_match_xla(rng):
    """Public entry points dispatch to XLA off-TPU; gradients flow through
    the XLA formulation either way."""
    x, w, b, ls, lb, res = _case(rng, 32, 16, 8)

    g1 = jax.grad(lambda *a: jnp.sum(ln_matmul(*a) ** 2),
                  argnums=(0, 3))(x, ls, lb, w, b)
    g2 = jax.grad(lambda *a: jnp.sum(_ln_matmul_xla(*a) ** 2),
                  argnums=(0, 3))(x, ls, lb, w, b)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)

    h1 = jax.grad(lambda *a: jnp.sum(matmul_residual(*a) ** 2))(x, w, b, res)
    h2 = jax.grad(lambda *a: jnp.sum(_matmul_residual_xla(*a) ** 2))(x, w, b, res)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)
