"""Device-resident classification metrics (pure jnp).

Replaces the reference's CPU metric stack (torcheval ``MulticlassF1Score`` /
``MulticlassConfusionMatrix`` + sklearn ``matthews_corrcoef``; see
`/root/reference/methods/PEFT_openclip.py:63-66,122-125` and
`/root/reference/aihab_utils/evaluation.py`) with a single on-device
accumulator: everything except top-k reduces from one confusion matrix, so
an entire evaluation epoch accumulates a [C, C] int32 array plus a few
scalars on device — no per-batch host syncs.

Numerical contracts (validated against sklearn in tests):
  * weighted F1: per-class F1 weighted by true-class support; classes with
    zero (precision+recall) contribute 0.
  * MCC: multiclass formula from the confusion matrix
        (c*s - sum_k p_k t_k) / sqrt((s^2 - sum p_k^2)(s^2 - sum t_k^2)),
    0 when the denominator is 0.
  * top-k accuracy: prediction counted correct if the target is among the
    k highest logits.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


def confusion_matrix(preds: jax.Array, targets: jax.Array,
                     num_classes: int) -> jax.Array:
    """[C, C] confusion matrix, rows = true class, cols = predicted."""
    idx = targets.astype(jnp.int32) * num_classes + preds.astype(jnp.int32)
    flat = jnp.zeros((num_classes * num_classes,), jnp.int32)
    flat = flat.at[idx].add(1)
    return flat.reshape(num_classes, num_classes)


def topk_correct(logits: jax.Array, targets: jax.Array, k: int) -> jax.Array:
    """Number of samples whose target is within the top-k logits."""
    k = min(k, logits.shape[-1])
    _, top_idx = jax.lax.top_k(logits, k)
    hit = jnp.any(top_idx == targets[:, None], axis=-1)
    return jnp.sum(hit.astype(jnp.int32))


def accuracy_from_cm(cm: jax.Array) -> jax.Array:
    total = jnp.sum(cm)
    return jnp.where(total > 0, jnp.trace(cm) / total, 0.0)


def weighted_f1_from_cm(cm: jax.Array) -> jax.Array:
    cm = cm.astype(jnp.float32)
    tp = jnp.diagonal(cm)
    support = jnp.sum(cm, axis=1)       # true counts per class
    predicted = jnp.sum(cm, axis=0)     # predicted counts per class
    denom = support + predicted         # = 2tp + fp + fn
    f1 = jnp.where(denom > 0, 2.0 * tp / jnp.maximum(denom, 1e-12), 0.0)
    total = jnp.sum(support)
    return jnp.where(total > 0, jnp.sum(f1 * support) / total, 0.0)


def mcc_from_cm(cm: jax.Array) -> jax.Array:
    cm = cm.astype(jnp.float64) if jax.config.jax_enable_x64 else cm.astype(jnp.float32)
    t = jnp.sum(cm, axis=1)  # true counts
    p = jnp.sum(cm, axis=0)  # predicted counts
    c = jnp.trace(cm)
    s = jnp.sum(cm)
    cov_ytyp = c * s - jnp.dot(t, p)
    cov_ypyp = s * s - jnp.dot(p, p)
    cov_ytyt = s * s - jnp.dot(t, t)
    denom = jnp.sqrt(cov_ytyt) * jnp.sqrt(cov_ypyp)
    return jnp.where(denom > 0, cov_ytyp / jnp.maximum(denom, 1e-12), 0.0)


class MetricState(NamedTuple):
    """Accumulated evaluation state (a pytree; lives on device)."""

    cm: jax.Array          # [C, C] int32
    correct_topk: jax.Array  # [len(ks)] int32
    loss_sum: jax.Array    # f32 scalar (sum of batch mean losses)
    batches: jax.Array     # int32
    seen: jax.Array        # int32


def init_metric_state(num_classes: int, ks: Sequence[int] = (1, 3)) -> MetricState:
    return MetricState(
        cm=jnp.zeros((num_classes, num_classes), jnp.int32),
        correct_topk=jnp.zeros((len(ks),), jnp.int32),
        loss_sum=jnp.zeros((), jnp.float32),
        batches=jnp.zeros((), jnp.int32),
        seen=jnp.zeros((), jnp.int32),
    )


def update_metric_state(
    state: MetricState,
    logits: jax.Array,
    targets: jax.Array,
    loss: Optional[jax.Array] = None,
    ks: Sequence[int] = (1, 3),
    valid_mask: Optional[jax.Array] = None,
) -> MetricState:
    """Accumulate one batch. ``valid_mask`` excludes padding rows (the
    device pipeline pads trailing batches to a static shape)."""
    num_classes = state.cm.shape[0]
    preds = jnp.argmax(logits, axis=-1)

    if valid_mask is None:
        valid_mask = jnp.ones(targets.shape, dtype=bool)
    n_valid = jnp.sum(valid_mask.astype(jnp.int32))

    # route padding rows to a throwaway diagonal cell then subtract nothing:
    # simpler — mask by moving invalid rows to class pair (0,0) and
    # subtracting their count afterwards.
    safe_targets = jnp.where(valid_mask, targets, 0)
    safe_preds = jnp.where(valid_mask, preds, 0)
    cm_batch = confusion_matrix(safe_preds, safe_targets, num_classes)
    pad = jnp.sum(jnp.logical_not(valid_mask).astype(jnp.int32))
    cm_batch = cm_batch.at[0, 0].add(-pad)

    ck = []
    for i, k in enumerate(ks):
        k_eff = min(k, logits.shape[-1])
        _, top_idx = jax.lax.top_k(logits, k_eff)
        hit = jnp.any(top_idx == targets[:, None], axis=-1) & valid_mask
        ck.append(jnp.sum(hit.astype(jnp.int32)))

    return MetricState(
        cm=state.cm + cm_batch,
        correct_topk=state.correct_topk + jnp.stack(ck),
        loss_sum=state.loss_sum + (loss if loss is not None else 0.0),
        batches=state.batches + jnp.where(n_valid > 0, 1, 0),
        seen=state.seen + n_valid,
    )


def compute_metrics(state: MetricState, ks: Sequence[int] = (1, 3)) -> Dict[str, jax.Array]:
    seen = jnp.maximum(state.seen, 1)
    out = {
        "loss": state.loss_sum / jnp.maximum(state.batches, 1),
        "f1": weighted_f1_from_cm(state.cm),
        "mcc": mcc_from_cm(state.cm),
        "cm": state.cm,
    }
    for i, k in enumerate(ks):
        out[f"top{k}"] = state.correct_topk[i] / seen
    return out


# ---------------------------------------------------------------------------
# L2 taxonomy roll-up (reference: aihab_utils/evaluation.py:80-250)
# ---------------------------------------------------------------------------

def map_l3_to_l2(values: jax.Array, l3_to_l2: jax.Array) -> jax.Array:
    """Gather L2 ids for L3 ids (targets or argmax predictions)."""
    return jnp.take(l3_to_l2, values.astype(jnp.int32))


def aggregate_logits_to_l2(
    logits_l3: jax.Array,
    l3_to_l2: jax.Array,
    num_l2: int,
    reduce: str = "mean",
) -> jax.Array:
    """Group L3 logits into L2 logits.

    "sum" totals subclass evidence, "mean" removes per-L2 count bias,
    "logsumexp" approximates log of summed probabilities.  Implemented as a
    one-hot matmul (MXU-friendly) rather than scatter loops.
    """
    if reduce not in {"sum", "mean", "logsumexp"}:
        raise ValueError(
            f"Unsupported reduce='{reduce}'. Expected one of: sum, mean, logsumexp.")
    group = jax.nn.one_hot(l3_to_l2, num_l2, dtype=logits_l3.dtype)  # [L3, L2]
    if reduce == "logsumexp":
        # max-shifted for stability, computed per L2 group via masked ops
        mask = group.T[None, :, :]  # [1, L2, L3]
        x = logits_l3[:, None, :]   # [B, 1, L3]
        neg_inf = jnp.array(-jnp.inf, logits_l3.dtype)
        masked = jnp.where(mask > 0, x, neg_inf)
        m = jnp.max(masked, axis=-1, keepdims=True)
        out = m[..., 0] + jnp.log(jnp.sum(jnp.where(mask > 0, jnp.exp(masked - m), 0.0), axis=-1))
        return out
    summed = logits_l3 @ group
    if reduce == "mean":
        counts = jnp.maximum(jnp.sum(group, axis=0), 1.0)
        summed = summed / counts
    return summed


class L2MetricsAccumulator:
    """Accumulate L2 metrics from L3 logits/targets.

    mode "argmax": map the L3 argmax prediction to L2 (top-1 only).
    mode "logits": aggregate L3 logits into L2 logits (supports top-k).
    State lives on device; ``compute()`` mirrors the reference's dict
    contract {top1[, top3], f1, mcc, cm}.
    """

    def __init__(self, l3_to_l2, num_l2: int, reduce: str = "mean",
                 topk: Sequence[int] = (1, 3), mode: str = "argmax",
                 return_confusion_matrix: bool = False):
        if mode not in {"argmax", "logits"}:
            raise ValueError(f"Unsupported mode='{mode}'.")
        self.l3_to_l2 = jnp.asarray(l3_to_l2, jnp.int32)
        self.num_l2 = int(num_l2)
        self.reduce = reduce
        self.mode = mode
        self.topk = (1,) if mode == "argmax" else tuple(int(k) for k in topk)
        self.return_confusion_matrix = return_confusion_matrix
        self.state = init_metric_state(self.num_l2, self.topk)

    def update(self, logits_l3, targets_l3, valid_mask=None) -> None:
        targets_l2 = map_l3_to_l2(jnp.asarray(targets_l3), self.l3_to_l2)
        logits_l3 = jnp.asarray(logits_l3)
        if self.mode == "argmax":
            preds_l2 = map_l3_to_l2(jnp.argmax(logits_l3, axis=-1), self.l3_to_l2)
            # one-hot logits so argmax/top-1 reduce to the mapped prediction
            l2_logits = jax.nn.one_hot(preds_l2, self.num_l2)
        else:
            l2_logits = aggregate_logits_to_l2(
                logits_l3, self.l3_to_l2, self.num_l2, self.reduce)
        self.state = update_metric_state(
            self.state, l2_logits, targets_l2, ks=self.topk,
            valid_mask=valid_mask)

    def compute(self) -> Dict[str, float]:
        m = compute_metrics(self.state, ks=self.topk)
        out: Dict[str, float] = {f"top{k}": float(m[f"top{k}"]) for k in self.topk}
        out["f1"] = float(m["f1"])
        out["mcc"] = float(m["mcc"])
        import numpy as np

        out["cm"] = (np.asarray(m["cm"]) if self.return_confusion_matrix else None)
        return out
