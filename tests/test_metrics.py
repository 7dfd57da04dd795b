"""Metric parity vs sklearn (the reference's metric engines reduce to the
same definitions: torcheval weighted F1 == sklearn f1_score(average='weighted'),
sklearn matthews_corrcoef, confusion_matrix)."""

import numpy as np
import pytest
from sklearn.metrics import confusion_matrix as sk_cm
from sklearn.metrics import f1_score, matthews_corrcoef

import jax.numpy as jnp

from aihab_clip_tpu.ops.metrics import (
    L2MetricsAccumulator,
    aggregate_logits_to_l2,
    compute_metrics,
    confusion_matrix,
    init_metric_state,
    map_l3_to_l2,
    mcc_from_cm,
    topk_correct,
    update_metric_state,
    weighted_f1_from_cm,
)
from aihab_clip_tpu.taxonomy import NUM_L2, NUM_L3, l3_to_l2_array


def _random_case(rng, n=200, c=7):
    y_true = rng.integers(0, c, size=n)
    logits = rng.standard_normal((n, c)).astype(np.float32)
    # bias towards correct to get a non-trivial CM
    logits[np.arange(n), y_true] += 1.0
    y_pred = logits.argmax(-1)
    return logits, y_true, y_pred


def test_confusion_matrix_matches_sklearn(rng):
    _, y_true, y_pred = _random_case(rng)
    ours = np.asarray(confusion_matrix(jnp.asarray(y_pred), jnp.asarray(y_true), 7))
    theirs = sk_cm(y_true, y_pred, labels=range(7))
    np.testing.assert_array_equal(ours, theirs)


def test_weighted_f1_matches_sklearn(rng):
    _, y_true, y_pred = _random_case(rng)
    cm = confusion_matrix(jnp.asarray(y_pred), jnp.asarray(y_true), 7)
    ours = float(weighted_f1_from_cm(cm))
    theirs = f1_score(y_true, y_pred, average="weighted")
    assert ours == pytest.approx(theirs, abs=1e-6)


def test_weighted_f1_empty_class(rng):
    # class never predicted and never true -> still correct weighting
    y_true = np.array([0, 0, 1, 1, 1])
    y_pred = np.array([0, 1, 1, 1, 0])
    cm = confusion_matrix(jnp.asarray(y_pred), jnp.asarray(y_true), 4)
    ours = float(weighted_f1_from_cm(cm))
    theirs = f1_score(y_true, y_pred, average="weighted", labels=range(4))
    assert ours == pytest.approx(theirs, abs=1e-6)


def test_mcc_matches_sklearn(rng):
    _, y_true, y_pred = _random_case(rng)
    cm = confusion_matrix(jnp.asarray(y_pred), jnp.asarray(y_true), 7)
    ours = float(mcc_from_cm(cm))
    theirs = matthews_corrcoef(y_true, y_pred)
    assert ours == pytest.approx(theirs, abs=1e-5)


def test_mcc_single_class_returns_zero():
    y = np.zeros(10, dtype=int)
    cm = confusion_matrix(jnp.asarray(y), jnp.asarray(y), 3)
    assert float(mcc_from_cm(cm)) == 0.0


def test_topk_correct(rng):
    logits, y_true, y_pred = _random_case(rng, n=50, c=5)
    top1 = int(topk_correct(jnp.asarray(logits), jnp.asarray(y_true), 1))
    assert top1 == int((y_pred == y_true).sum())
    top5 = int(topk_correct(jnp.asarray(logits), jnp.asarray(y_true), 5))
    assert top5 == 50  # k == num classes -> everything correct


def test_accumulator_over_batches(rng):
    logits, y_true, y_pred = _random_case(rng, n=96, c=7)
    state = init_metric_state(7)
    for i in range(0, 96, 32):
        state = update_metric_state(
            state, jnp.asarray(logits[i:i + 32]), jnp.asarray(y_true[i:i + 32]),
            loss=jnp.asarray(0.5))
    m = compute_metrics(state)
    assert float(m["top1"]) == pytest.approx((y_pred == y_true).mean())
    assert float(m["f1"]) == pytest.approx(
        f1_score(y_true, y_pred, average="weighted"), abs=1e-6)
    assert float(m["mcc"]) == pytest.approx(matthews_corrcoef(y_true, y_pred), abs=1e-5)
    assert float(m["loss"]) == pytest.approx(0.5)
    np.testing.assert_array_equal(np.asarray(m["cm"]), sk_cm(y_true, y_pred, labels=range(7)))


def test_accumulator_with_padding_mask(rng):
    logits, y_true, y_pred = _random_case(rng, n=40, c=7)
    state = init_metric_state(7)
    # pad the batch to 64 rows; mask marks the valid 40
    pad_logits = np.zeros((64, 7), np.float32)
    pad_logits[:40] = logits
    pad_targets = np.zeros(64, np.int64)
    pad_targets[:40] = y_true
    mask = np.arange(64) < 40
    state = update_metric_state(
        state, jnp.asarray(pad_logits), jnp.asarray(pad_targets),
        valid_mask=jnp.asarray(mask))
    m = compute_metrics(state)
    assert int(state.seen) == 40
    assert float(m["top1"]) == pytest.approx((y_pred == y_true).mean())
    np.testing.assert_array_equal(np.asarray(m["cm"]), sk_cm(y_true, y_pred, labels=range(7)))


def test_map_l3_to_l2():
    table = jnp.asarray(l3_to_l2_array())
    out = np.asarray(map_l3_to_l2(jnp.asarray([0, 3, 5, 12]), table))
    np.testing.assert_array_equal(out, [0, 9, 3, 5])


def test_aggregate_logits_modes(rng):
    table = jnp.asarray(l3_to_l2_array())
    logits = jnp.asarray(rng.standard_normal((4, NUM_L3)).astype(np.float32))
    for reduce in ("sum", "mean", "logsumexp"):
        out = np.asarray(aggregate_logits_to_l2(logits, table, NUM_L2, reduce))
        assert out.shape == (4, NUM_L2)
    # reference behavior on a known group: grassland l3 ids 5..9 -> l2 id 3
    s = np.asarray(aggregate_logits_to_l2(logits, table, NUM_L2, "sum"))
    np.testing.assert_allclose(
        s[:, 3], np.asarray(logits)[:, 5:10].sum(-1), rtol=1e-5)
    m = np.asarray(aggregate_logits_to_l2(logits, table, NUM_L2, "mean"))
    np.testing.assert_allclose(
        m[:, 3], np.asarray(logits)[:, 5:10].mean(-1), rtol=1e-5)
    lse = np.asarray(aggregate_logits_to_l2(logits, table, NUM_L2, "logsumexp"))
    from scipy.special import logsumexp as sp_lse

    np.testing.assert_allclose(
        lse[:, 3], sp_lse(np.asarray(logits)[:, 5:10], axis=-1), rtol=1e-5)
    with pytest.raises(ValueError):
        aggregate_logits_to_l2(logits, table, NUM_L2, "max")


def test_l2_accumulator_argmax_mode(rng):
    table = l3_to_l2_array()
    logits, y_true, y_pred = _random_case(rng, n=100, c=NUM_L3)
    acc = L2MetricsAccumulator(table, NUM_L2, mode="argmax",
                               return_confusion_matrix=True)
    for i in range(0, 100, 30):
        acc.update(jnp.asarray(logits[i:i + 30]), jnp.asarray(y_true[i:i + 30]))
    m = acc.compute()
    l2_true = table[y_true]
    l2_pred = table[y_pred]
    assert m["top1"] == pytest.approx((l2_true == l2_pred).mean())
    assert m["f1"] == pytest.approx(
        f1_score(l2_true, l2_pred, average="weighted"), abs=1e-6)
    assert m["mcc"] == pytest.approx(matthews_corrcoef(l2_true, l2_pred), abs=1e-5)
    assert m["cm"].shape == (NUM_L2, NUM_L2)
    assert "top3" not in m  # argmax mode reports top-1 only


def test_l2_accumulator_logits_mode(rng):
    table = l3_to_l2_array()
    logits, y_true, _ = _random_case(rng, n=60, c=NUM_L3)
    acc = L2MetricsAccumulator(table, NUM_L2, mode="logits", reduce="mean")
    acc.update(jnp.asarray(logits), jnp.asarray(y_true))
    m = acc.compute()
    assert set(m) >= {"top1", "top3", "f1", "mcc"}
    assert 0.0 <= m["top1"] <= m["top3"] <= 1.0
