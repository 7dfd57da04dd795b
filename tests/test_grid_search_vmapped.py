"""Vmapped grid search == sequential training, combination by combination."""

import numpy as np
import pytest

import jax.numpy as jnp

from aihab_clip_tpu.train.prolip import (
    ProjectorSpec,
    _vmapped_grid_train,
    grid_search,
    projector_accuracy,
    train_projector,
)


def _toy(rng, n=48, pre=12, emb=8, c=4):
    protos = rng.standard_normal((c, emb)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    labels = rng.integers(0, c, size=n)
    true_w = rng.standard_normal((pre, emb)).astype(np.float32) * 0.2
    feats = ((protos[labels] + 0.05 * rng.standard_normal((n, emb)))
             @ np.linalg.pinv(true_w)).astype(np.float32)
    init = ProjectorSpec(weight=jnp.asarray(
        true_w + 0.4 * rng.standard_normal((pre, emb)).astype(np.float32)),
        bias=None)
    return feats, labels, jnp.asarray(protos.T), init


def test_vmapped_matches_sequential():
    rng = np.random.default_rng(11)
    feats, labels, tw, init = _toy(rng)
    views = [feats, feats * 1.01]
    combos = [(1e-2, 0.0), (1e-3, 0.5), (1e-4, 10.0)]
    lrs = jnp.asarray([c[0] for c in combos])
    lams = jnp.asarray([c[1] for c in combos])

    weights = _vmapped_grid_train(
        jnp.asarray(np.stack(views)), jnp.asarray(labels, jnp.int32), tw,
        init.weight, None, lrs, lams, epochs=12)

    for i, (lr, lam) in enumerate(combos):
        proj_seq, _ = train_projector(views, labels, tw, init, lr, lam,
                                      epochs=12, verbose=False)
        np.testing.assert_allclose(np.asarray(weights[i]),
                                   np.asarray(proj_seq.weight),
                                   atol=2e-4, rtol=1e-3)


def test_grid_search_vmapped_vs_sequential_choice():
    rng = np.random.default_rng(12)
    feats, labels, tw, init = _toy(rng, n=60)
    val_feats, val_labels = feats[:24], labels[:24]
    grid_lr = [1e-2, 1e-5]
    grid_lam = [0.0, 1.0]

    lr_v, lam_v, acc_v = grid_search(
        [feats], labels, tw, init, val_feats, val_labels, epochs=10,
        lr_grid=grid_lr, lambda_grid=grid_lam, feat_batch_size=0,
        verbose=False)
    lr_s, lam_s, acc_s = grid_search(
        [feats], labels, tw, init, val_feats, val_labels, epochs=10,
        lr_grid=grid_lr, lambda_grid=grid_lam, feat_batch_size=16,
        verbose=False)
    # both regimes identify the trainable lr; absolute accuracies differ
    # (chunked mode takes more optimizer steps per epoch by design)
    assert lr_v == 1e-2
    assert lr_s == 1e-2
    assert acc_v > 60.0 and acc_s > 60.0
