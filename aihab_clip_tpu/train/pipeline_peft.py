"""Pipeline-parallel PEFT training step.

For towers whose weights outgrow one chip (ViT-g/bigG class presets in
``models/clip.py``), the PEFT step (`train/peft.py`, reference semantics
`/root/reference/methods/PEFT_openclip.py:240-279`) runs with the visual
transformer blocks pipeline-parallel: blocks live stacked over the
``stage`` mesh axis (``parallel/pipeline.py``), microbatches stream
through the GPipe schedule, and ``jax.grad`` through the scan+ppermute
program yields pipeline-parallel backward.  Compose with data
parallelism via ``make_pipeline_mesh(n_stages, data_parallel=d)``.

Freezing differs from the single-chip trainer by necessity: frozen
block layers still flow through the schedule (every stage runs its
whole group), so instead of partitioning the param tree, the lock mask
is applied to the stacked gradients.  Adam on an always-zero gradient
leaf is an exact no-op (m = v = 0 forever), so masked layers stay
bit-identical to their initial values — the same semantics as the
partitioned trainer, verified by the step-parity test
(`tests/test_pipeline_parallel.py`).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.clip import CLIPModel
from ..models.text_head import compute_text_weights
from ..parallel.pipeline import pipeline_encode
from .peft import PEFTConfig, masked_ce_metrics

HEAD_LEAVES = ("ln_post", "proj")


def stacked_layer_mask(n_layers: int, n_stages: int,
                       unlocked_layers: int) -> jax.Array:
    """[stages, layers_per_stage] bool — True = the last ``unlocked_layers``
    global layers (the open_clip ``lock_image_tower`` ordering)."""
    per = n_layers // n_stages
    gidx = np.arange(n_layers).reshape(n_stages, per)
    return jnp.asarray(gidx >= (n_layers - unlocked_layers))


def _with_head(params: Dict, head: Dict) -> Dict:
    vis = dict(params["visual"])
    vis.update(head)
    out = dict(params)
    out["visual"] = vis
    return out


def split_head_params(params: Dict) -> Dict:
    """The trainable non-block visual leaves (ln_post + projection)."""
    return {k: params["visual"][k] for k in HEAD_LEAVES
            if k in params["visual"]}


def make_pipeline_train_step(model: CLIPModel, cfg: PEFTConfig,
                             text_weights: Optional[jax.Array],
                             prompt_tokens: Optional[jax.Array],
                             mesh, *, num_microbatches: int,
                             unlocked_layers: int):
    """Build the jitted pipeline-parallel PEFT step.

    Returns (opt, step) with
    ``step(trainable, frozen, opt_state, images_u8, labels, valid, key,
    lr) -> (trainable, opt_state, metrics)`` — the same contract as
    ``peft.make_train_step``.  ``trainable`` is ``{"blocks": stacked
    stage params, "head": {ln_post, proj}}`` (head omitted when
    ``train_head=False``); ``frozen`` is the canonical param tree whose
    embedding/head leaves are read replicated.
    """
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    ccfg = model.config
    n_stages = mesh.shape["stage"]
    mask = stacked_layer_mask(ccfg.vision_layers, n_stages, unlocked_layers)

    from ..ops.fast_warp import fast_train_transform
    from ..ops.preprocess import normalize_stats_for, train_transform

    aug_fn = (fast_train_transform if cfg.aug_impl == "fast"
              else train_transform)
    nmean, nstd = normalize_stats_for(model.config)

    def loss_fn(trainable, frozen, images_u8, labels, valid, key):
        params = (_with_head(frozen, trainable["head"])
                  if "head" in trainable else frozen)
        x = aug_fn(images_u8, key, cfg.resolution, crop_mode=cfg.crop_mode,
                   flip=cfg.flip, rotation=cfg.rotation,
                   dtype=cfg.compute_dtype, mean=nmean, std=nstd)
        _, feats = pipeline_encode(params, trainable["blocks"], x, ccfg,
                                   mesh, num_microbatches=num_microbatches,
                                   project=True, dtype=cfg.compute_dtype)
        feats = feats.astype(jnp.float32)
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        if cfg.tune_text:
            w = compute_text_weights(model, params, prompt_tokens,
                                     cfg.num_classes, cfg.num_templates)
        else:
            w = text_weights
        logits = 100.0 * feats @ w
        return masked_ce_metrics(logits, labels, valid)

    def _mask_grads(grads):
        def apply(leaf):
            m = mask.reshape(mask.shape + (1,) * (leaf.ndim - 2))
            return leaf * m.astype(leaf.dtype)

        out = dict(grads)
        out["blocks"] = jax.tree_util.tree_map(apply, grads["blocks"])
        return out

    @jax.jit
    def step(trainable, frozen, opt_state, images_u8, labels, valid, key,
             lr):
        (loss, (correct, n_valid)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable, frozen, images_u8, labels,
                                   valid, key)
        grads = _mask_grads(grads)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = opt.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {"loss": loss, "correct": correct,
                                      "n_valid": n_valid}

    return opt, step


def init_pipeline_trainable(params: Dict, ccfg, mesh, *,
                            train_head: bool = True) -> Dict:
    """Stack + place the block params and pull out the head leaves."""
    from ..parallel.pipeline import place_stage_params, stack_stage_params

    n_stages = mesh.shape["stage"]
    blocks = place_stage_params(
        mesh, stack_stage_params(params, ccfg.vision_layers, n_stages))
    out: Dict[str, Any] = {"blocks": blocks}
    if train_head:
        out["head"] = split_head_params(params)
    return out
