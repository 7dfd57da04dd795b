"""Folded-BN ModifiedResNet fast path vs the canonical Flax module."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aihab_clip_tpu.models import CLIPModel, load
from aihab_clip_tpu.models.fast_resnet import (
    fold_resnet_bn,
    resnet_encode_folded,
)


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


def _randomize_bn_stats(params, rng):
    """Random (non-identity) frozen-BN stats so the fold is actually
    exercised — fresh-init stats are mean=0/var=1 which fold trivially."""
    def walk(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                if {"mean", "var", "scale", "bias"} <= set(v):
                    v["mean"] = jnp.asarray(
                        rng.standard_normal(v["mean"].shape) * 0.3,
                        v["mean"].dtype)
                    v["var"] = jnp.asarray(
                        0.5 + rng.random(v["var"].shape), v["var"].dtype)
                    v["scale"] = jnp.asarray(
                        0.5 + rng.random(v["scale"].shape), v["scale"].dtype)
                    v["bias"] = jnp.asarray(
                        rng.standard_normal(v["bias"].shape) * 0.2,
                        v["bias"].dtype)
                else:
                    walk(v)
    walk(params)
    return params


def test_folded_matches_canonical(rng):
    b = load("random:TinyRN", seed=3)
    params = jax.tree_util.tree_map(lambda x: x, b.params)  # mutable copy
    params = _randomize_bn_stats(params, rng)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))

    ref_pre, ref_proj = b.model.apply(
        {"params": params}, x, method=CLIPModel.encode_image, project=True)

    folded = fold_resnet_bn(params["visual"], dtype=jnp.float32)
    pre, proj = resnet_encode_folded(folded, x, b.config, project=True,
                                     dtype=jnp.float32)

    np.testing.assert_allclose(np.asarray(pre), np.asarray(ref_pre),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(ref_proj),
                               atol=2e-4, rtol=2e-4)


def test_folded_bf16_close(rng):
    """bf16 folded tower tracks the f32 canonical within bf16 tower
    tolerances (the fold itself is f32-exact; the kernel cast adds one
    rounding)."""
    b = load("random:TinyRN", seed=3)
    params = _randomize_bn_stats(
        jax.tree_util.tree_map(lambda x: x, b.params), rng)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))

    ref_pre = b.model.apply({"params": params}, x,
                            method=CLIPModel.encode_image)
    folded = fold_resnet_bn(params["visual"], dtype=jnp.bfloat16)
    pre = resnet_encode_folded(folded, x, b.config, dtype=jnp.bfloat16)

    ref = np.asarray(ref_pre, np.float32)
    got = np.asarray(pre, np.float32)
    denom = np.maximum(np.abs(ref), 1.0)
    assert (np.abs(got - ref) / denom).max() < 0.08
    cos = (ref * got).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1))
    assert cos.min() > 0.999
