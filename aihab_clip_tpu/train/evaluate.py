"""Evaluation loop: zero-shot classification and fine-tune validation.

The device side is ONE jitted step — preprocess (eval transform), image
encode, logits, metric-state update — carried as a pytree across batches;
only the final small metric dict crosses back to the host.  This replaces
the reference's per-batch host syncs (`_run_validation`,
`/root/reference/methods/PEFT_openclip.py:50-136`, which moves preds/targets
to CPU every batch for torcheval/sklearn).

Returns the reference's metric contract: loss, top1, top3, weighted F1,
MCC, optional confusion matrix, optional L2 roll-up metrics, optional
per-sample classification tracking rows.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import SplitView
from ..ops import metrics as M
from ..ops.preprocess import eval_transform
from .tracker import ClassificationTracker


def masked_ce_metrics(logits, labels, valid):
    """Masked cross-entropy + (correct, n_valid) — the single definition
    of the classification objective tail.  Every step builder (per-step,
    epoch-scan, pipeline-parallel, eval) shares it so a loss change cannot
    silently diverge between regimes."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    loss = jnp.sum(jnp.where(valid, nll, 0.0)) / n_valid
    correct = jnp.sum(jnp.where(valid, jnp.argmax(logits, -1) == labels,
                                False))
    return loss, (correct, n_valid)


def make_eval_step(model, resolution: int, num_classes: int,
                   compute_dtype=jnp.float32, ks=(1, 3), project: bool = True,
                   mesh=None, sharded_weights: bool = False,
                   scan_blocks: bool = False, pack=None):
    """Build the jitted (params, text_weights, batch, state) -> state step.

    ``pack``: the per-family precomputed fast pack
    (`fast_vit.pack_fastest` — SigLIP head-group weights, ConvNeXt banded
    dw matrices, folded-RN convs), built ONCE by the caller outside jit
    and threaded through a jit argument.

    Single-device steps dispatch to the whole-block fused encode; under a
    data-parallel mesh the same kernels run per shard via shard_map
    (tensor-parallel meshes, whose weights are sharded, keep the
    canonical XLA tower — see ``encode_image_fastest``).

    ``sharded_weights``: the caller's params are sharded along a mesh axis
    (FSDP) — the shard_map fast paths assume replicated weights and would
    re-gather the full tower to every chip per batch, so the encode stays
    on the canonical GSPMD-partitionable module."""

    from ..models.fast_vit import encode_image_fastest

    def encode_proj(params, pk, x):
        if sharded_weights:
            # FSDP-sharded weights keep the GSPMD-partitionable canonical
            # math; scan_blocks shrinks the compiled program L-fold for
            # deep towers (identical numerics — see fast_siglip)
            if scan_blocks:
                from ..models.siglip import SigLIPConfig

                cfgm = getattr(model, "config", None)
                if isinstance(cfgm, SigLIPConfig):
                    from ..models.fast_siglip import siglip_encode_scan

                    return siglip_encode_scan(params, x, cfgm, project=True,
                                              dtype=compute_dtype)
                if cfgm is not None and cfgm.is_vit:
                    from ..models.fast_vit import vit_encode_scan

                    return vit_encode_scan(params, x, cfgm, project=True,
                                           dtype=compute_dtype)
            return model.apply({"params": params}, x,
                               method=type(model).encode_image, project=True)
        return encode_image_fastest(model, params, x,
                                    getattr(model, "config", None),
                                    project=True, mesh=mesh, packed=pk)

    # per-family pixel stats (SigLIP: 0.5/0.5, CLIP: CLIP stats)
    from ..ops.preprocess import normalize_stats_for

    nmean, nstd = normalize_stats_for(model.config)

    @jax.jit
    def jit_step_inner(pk, params, text_weights, images_u8, targets, valid,
                       state):
        x = eval_transform(images_u8, resolution, dtype=compute_dtype,
                           mean=nmean, std=nstd)
        if project:
            _, feats = encode_proj(params, pk, x)
        else:
            feats = model.apply({"params": params}, x,
                                method=type(model).encode_image)
        feats = feats.astype(jnp.float32)
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        logits = 100.0 * feats @ text_weights

        # masked mean CE (padding rows excluded)
        loss, _ = masked_ce_metrics(logits, targets, valid)

        state = M.update_metric_state(state, logits, targets, loss=loss,
                                      ks=ks, valid_mask=valid)
        return state, logits

    def jit_step(params, *args, **kw):
        # the pack rides as a leading jit ARGUMENT (a closure constant
        # would embed the multi-GB ConvNeXt matrices into the program)
        return jit_step_inner(pack, params, *args, **kw)

    if mesh is None:
        return jit_step

    from ..ops.attention import xla_attention_dispatch

    def step(*args, **kw):
        # mesh runs: trace with the GSPMD-partitionable XLA attention
        # (see make_train_step)
        with xla_attention_dispatch():
            return jit_step(*args, **kw)

    return step


def evaluate(
    model,
    params,
    view: SplitView,
    text_weights: jax.Array,
    resolution: int,
    num_classes: int,
    compute_dtype=jnp.float32,
    return_confusion_matrix: bool = False,
    l2_eval_ctx: Optional[Dict] = None,
    tracker: Optional[ClassificationTracker] = None,
    project: bool = True,
    eval_step=None,
    mesh=None,
    sharded_weights: bool = False,
) -> Dict[str, Any]:
    """Evaluate a split. Returns
    {loss, top1, top3, f1, mcc, cm (opt), l2 (opt)}.

    With ``mesh``, batches are sharded over the ``data`` axis and the
    step runs SPMD (metric state replicates; GSPMD inserts the
    reductions)."""
    if eval_step is None:
        from ..models.fast_vit import pack_fastest

        pack = None if sharded_weights else pack_fastest(
            model, params, model.config, compute_dtype)
        eval_step = make_eval_step(
            model, resolution, num_classes, compute_dtype, project=project,
            mesh=mesh, sharded_weights=sharded_weights, pack=pack)
    step = eval_step
    state = M.init_metric_state(num_classes)

    l2_acc = None
    if l2_eval_ctx is not None:
        l2_acc = M.L2MetricsAccumulator(
            l3_to_l2=l2_eval_ctx["l3_to_l2"],
            num_l2=l2_eval_ctx["num_l2"],
            reduce=l2_eval_ctx.get("reduce", "mean"),
            topk=l2_eval_ctx.get("topk", (1, 3)),
            mode=l2_eval_ctx.get("mode", "argmax"),
            return_confusion_matrix=l2_eval_ctx.get(
                "return_confusion_matrix", False),
        )

    for batch in view.batches():
        imgs = jnp.asarray(batch.images)
        labs = jnp.asarray(batch.labels)
        val = jnp.asarray(batch.valid)
        if mesh is not None:
            from ..parallel import shard_batch

            imgs, labs, val = shard_batch(mesh, imgs, labs, val)
        state, logits = step(params, text_weights, imgs, labs, val, state)
        if l2_acc is not None:
            l2_acc.update(logits, jnp.asarray(batch.labels),
                          valid_mask=jnp.asarray(batch.valid))
        if tracker is not None:
            tracker.track_batch(np.asarray(logits), batch.labels, batch.valid,
                                view.metadata_rows(batch.indices))

    m = M.compute_metrics(state)
    out: Dict[str, Any] = {
        "loss": float(m["loss"]),
        "top1": float(m["top1"]),
        "top3": float(m["top3"]),
        "f1": float(m["f1"]),
        "mcc": float(m["mcc"]),
        "cm": np.asarray(m["cm"]) if return_confusion_matrix else None,
        "l2": l2_acc.compute() if l2_acc is not None else None,
    }
    return out
