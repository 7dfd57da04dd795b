"""ProLIP: projector-only tuning on cached pre-projection features.

Re-implements the reference method (`/root/reference/methods/ProLIP.py`) as
jitted functional training:

  * projector = the model's own visual projection, trainable
    (ViT: the ``visual.proj`` matrix; ResNet: the attention-pool ``c_proj``
    weight with its bias frozen);
  * loss = CE(100 * normalize(x @ P) @ text_weights, y)
           + lambda * sum((P - P_init)^2);
  * one optimizer step per epoch on the whole cached tensor (few-shot), or
    chunked steps with lambda scaled by 1/num_chunks (full-data);
  * augmentation-view cycling: epoch e uses cached view (e + 1) % V
    (the reference's counter produces exactly this sequence);
  * Adam(eps=1e-4) + cosine-annealed LR stepped per epoch;
  * optional 7x7 (lr, lambda) grid search scored on the validation split.

TPU-first differences with identical semantics: the whole cached feature
tensor lives on device, each epoch is ONE jitted step (or a jitted
chunk-scan), and the grid search encodes validation features once and
reuses them for all 49 combinations (the reference re-runs the frozen
encoder every combination).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

LR_GRID = [1e-2, 1e-3, 1e-4, 1e-5, 1e-6, 1e-7, 1e-8]
LAMBDA_GRID = [10, 1, 0.1, 0.01, 0.001, 0.0001, 0]


@dataclasses.dataclass
class ProjectorSpec:
    """The trainable projector extracted from a CLIP param tree."""

    weight: jnp.ndarray          # [pre_dim, embed_dim]
    bias: Optional[jnp.ndarray]  # [embed_dim] (frozen; ResNet c_proj only)

    @staticmethod
    def from_clip_params(params, is_vit: bool) -> "ProjectorSpec":
        if is_vit:
            return ProjectorSpec(weight=jnp.asarray(params["visual"]["proj"],
                                                    jnp.float32), bias=None)
        vis = params["visual"]
        # ConvNeXt linear head: 'head_proj' is the visual projection —
        # weight trains, bias stays frozen (the RN c_proj convention,
        # reference `/root/reference/methods/ProLIP.py:15-29`).  The MLP
        # head ('_d' variants) has no single linear whose input is the
        # cached pre-projection feature, so projector-only tuning is
        # undefined there — fail loudly rather than train a mismatched map.
        if "head_proj" in vis:
            # Real open_clip checkpoints export the head with
            # proj_bias=False; the converter zero-fills the Flax bias, but
            # tolerate a tree where it is absent entirely.
            hb = vis["head_proj"].get("bias")
            w = jnp.asarray(vis["head_proj"]["kernel"], jnp.float32)
            return ProjectorSpec(
                weight=w,
                bias=(jnp.asarray(hb, jnp.float32) if hb is not None
                      else jnp.zeros(w.shape[-1], jnp.float32)))
        if "head_fc1" in vis:
            raise ValueError(
                "ProLIP projector tuning is undefined for MLP-head ConvNeXt "
                "variants (convnext_*_d): the projection is a 2-layer MLP, "
                "not a linear map over the cached pre-projection feature. "
                "Use a linear-head variant (convnext_base_w / "
                "convnext_xxlarge) or the PEFT path.")
        ap = vis["attnpool"]["c_proj"]
        return ProjectorSpec(weight=jnp.asarray(ap["kernel"], jnp.float32),
                             bias=jnp.asarray(ap["bias"], jnp.float32))

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        y = x.astype(jnp.float32) @ self.weight
        if self.bias is not None:
            y = y + self.bias
        return y


def view_for_epoch(epoch: int, aug_views: int) -> int:
    """The reference's view-cycling counter reduces to (epoch+1) mod V."""
    return (epoch + 1) % max(aug_views, 1)


def cosine_lr(base_lr: float, epoch: int, total_epochs: int) -> float:
    """torch CosineAnnealingLR with eta_min=0, stepped per epoch."""
    if total_epochs <= 0:
        return base_lr
    return base_lr * 0.5 * (1.0 + math.cos(math.pi * epoch / total_epochs))


def _make_step(bias: Optional[jnp.ndarray]):
    """Jitted train step over (weight, opt_state, x, y, valid, lr, lam, tw,
    init_w).  The text head and the init anchor ride as ARGUMENTS — closing
    over them would bake both matrices into the compiled program as
    constants (the no-closure rule, CLAUDE.md) and recompile per call."""
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3, eps=1e-4)

    def loss_fn(weight, x, y, valid, lam, tw, init_w):
        feats = x.astype(jnp.float32) @ weight
        if bias is not None:
            feats = feats + bias
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        logits = 100.0 * feats @ tw
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
        n_valid = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
        ce = jnp.sum(jnp.where(valid, nll, 0.0)) / n_valid
        mse = jnp.sum(jnp.square(weight - init_w))
        correct = jnp.sum(
            jnp.where(valid, (jnp.argmax(logits, -1) == y), False))
        return ce + lam * mse, (ce, mse, correct, n_valid)

    @jax.jit
    def step(weight, opt_state, x, y, valid, lr, lam, tw, init_w):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            weight, x, y, valid, lam, tw, init_w)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = opt.update(grads, opt_state, weight)
        weight = optax.apply_updates(weight, updates)
        return weight, opt_state, loss, aux

    return opt, step


def _chunk_batches(n: int, chunk: int):
    for start in range(0, n, chunk):
        yield start, min(chunk, n - start)


def _train_scan(views_d: jnp.ndarray, labels_d: jnp.ndarray,
                text_weights: jnp.ndarray, init_weight: jnp.ndarray,
                bias: Optional[jnp.ndarray], lr: float, lam: float,
                epochs: int):
    """Whole ProLIP training (full-batch regime) as ONE jitted lax.scan over
    epochs — a single device dispatch instead of one per epoch (per-epoch
    host syncs dominate through a remote tunnel: measured ~4 steps/s for
    sub-millisecond compute)."""
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=lr, eps=1e-4)
    aug_views = views_d.shape[0]
    n = labels_d.shape[0]

    # cached features / labels / anchors are jit ARGUMENTS (closing over
    # them would embed the whole cache into the compiled program)
    def loss_fn(weight, x, labels_a, init_w, tw):
        feats = x @ weight
        if bias is not None:
            feats = feats + bias
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        logits = 100.0 * feats @ tw
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = jnp.mean(-jnp.take_along_axis(logp, labels_a[:, None], 1)[:, 0])
        mse = jnp.sum(jnp.square(weight - init_w))
        correct = jnp.sum(jnp.argmax(logits, -1) == labels_a)
        return ce + lam * mse, (ce, mse, correct)

    @jax.jit
    def train(weight, opt_state, views_a, labels_a, init_w, tw):
        def body(carry, e):
            weight, opt_state = carry
            x = jax.lax.dynamic_index_in_dim(
                views_a, (e + 1) % aug_views, axis=0, keepdims=False)
            lr_e = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * e / epochs))
            (loss, (ce, mse, correct)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(weight, x, labels_a, init_w, tw)
            opt_state.hyperparams["learning_rate"] = lr_e
            updates, opt_state = opt.update(grads, opt_state, weight)
            weight = optax.apply_updates(weight, updates)
            return (weight, opt_state), (loss, ce, mse, correct, lr_e)

        (weight, opt_state), trail = jax.lax.scan(
            body, (weight, opt_state), jnp.arange(epochs))
        return weight, trail

    opt_state = opt.init(init_weight)
    weight, (losses, ces, mses, corrects, lrs) = train(
        init_weight, opt_state, views_d, labels_d, init_weight,
        jnp.asarray(text_weights, jnp.float32))
    losses, ces, mses = np.asarray(losses), np.asarray(ces), np.asarray(mses)
    corrects, lrs = np.asarray(corrects), np.asarray(lrs)
    stats: Dict = {"epochs": [
        {"acc": float(corrects[e]) / n, "ce": float(ces[e]),
         "mse": float(mses[e]), "lr": float(lrs[e])}
        for e in range(epochs)
    ], "final_loss": float(losses[-1]) if epochs else None}
    return weight, stats


def train_projector(
    views: List[np.ndarray],
    labels: np.ndarray,
    text_weights: jnp.ndarray,
    init_spec: ProjectorSpec,
    lr: float,
    lam: float,
    epochs: int,
    feat_batch_size: int = 0,
    verbose: bool = True,
) -> Tuple[ProjectorSpec, Dict]:
    """Run the ProLIP training loop; returns (trained projector, stats)."""
    aug_views = len(views)
    labels_d = jnp.asarray(labels, jnp.int32)
    n = int(labels_d.shape[0])

    # full-batch regime: the whole training is one scanned device program
    if not (feat_batch_size and feat_batch_size > 0 and n > feat_batch_size):
        weight, stats = _train_scan(
            jnp.asarray(np.stack(views, 0), jnp.float32), labels_d,
            text_weights, init_spec.weight, init_spec.bias, lr, lam, epochs)
        if verbose:
            for e, s in enumerate(stats["epochs"]):
                print(f"Train Epoch: {e} / {epochs}  Acc: {s['acc']:.4f}, "
                      f"Loss_ce: {s['ce']:.4f}, Loss_mse: {s['mse']:.4f}, "
                      f"lr: {s['lr']:.2e}")
        return ProjectorSpec(weight=weight, bias=init_spec.bias), stats

    views_d = [jnp.asarray(v, jnp.float32) for v in views]
    init_weight = init_spec.weight
    weight = init_weight
    opt, step = _make_step(init_spec.bias)
    opt_state = opt.init(weight)

    stats: Dict = {"epochs": []}
    last_loss = None
    for epoch in range(epochs):
        x = views_d[view_for_epoch(epoch, aug_views)]
        lr_e = cosine_lr(lr, epoch, epochs)

        # chunked regime (the full-batch case returned above):
        # lambda scales by 1/num_chunks, reference semantics
        # `/root/reference/methods/ProLIP.py:189-226`
        num_chunks = math.ceil(n / feat_batch_size)
        lam_scaled = lam / float(max(num_chunks, 1))
        correct = 0.0
        seen = 0.0
        ce_sum, mse_sum = 0.0, 0.0
        for start, k in _chunk_batches(n, feat_batch_size):
            if k < feat_batch_size:
                # keep the static chunk shape: take the LAST B rows and
                # mask out the (already-trained) overlap prefix
                xi = x[n - feat_batch_size:n]
                yi = labels_d[n - feat_batch_size:n]
                valid = jnp.arange(feat_batch_size) >= (feat_batch_size - k)
            else:
                xi = x[start:start + k]
                yi = labels_d[start:start + k]
                valid = jnp.ones((k,), bool)
            weight, opt_state, loss, (ce, mse, corr, nv) = step(
                weight, opt_state, xi, yi, valid, lr_e, lam_scaled,
                text_weights, init_weight)
            correct += float(corr)
            seen += float(nv)
            ce_sum += float(ce)
            mse_sum += float(mse)
            last_loss = float(loss)
        epoch_stats = {"acc": correct / max(seen, 1), "ce": ce_sum / num_chunks,
                       "mse": mse_sum / num_chunks, "lr": lr_e}
        stats["epochs"].append(epoch_stats)
        if verbose:
            print(f"Train Epoch: {epoch} / {epochs}  "
                  f"Acc: {epoch_stats['acc']:.4f}, Loss_ce: {epoch_stats['ce']:.4f}, "
                  f"Loss_mse: {epoch_stats['mse']:.4f}, lr: {lr_e:.2e}")

    stats["final_loss"] = last_loss
    return ProjectorSpec(weight=weight, bias=init_spec.bias), stats


@jax.jit
def _predict_top1(w, b, x, text_weights):
    """Module-level jit (compiled once per shape, not per call — the grid
    fallback scores 49 projectors; text_weights rides as an ARGUMENT per
    the no-closure rule)."""
    y = x.astype(jnp.float32) @ w
    if b is not None:
        y = y + b
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
    return jnp.argmax(100.0 * y @ text_weights, axis=-1)


def projector_accuracy(proj: ProjectorSpec, feats: np.ndarray,
                       labels: np.ndarray, text_weights: jnp.ndarray) -> float:
    """top-1 accuracy (%) of projected+normalized features vs the text head."""
    preds = np.asarray(_predict_top1(proj.weight, proj.bias,
                                     jnp.asarray(feats), text_weights))
    return float((preds == np.asarray(labels)).mean() * 100.0)


def _vmapped_grid_train(
    views_d: jnp.ndarray,      # [V, N, pre]
    labels_d: jnp.ndarray,     # [N]
    text_weights: jnp.ndarray,
    init_weight: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    lrs: jnp.ndarray,          # [K]
    lams: jnp.ndarray,         # [K]
    epochs: int,
) -> jnp.ndarray:
    """Train K projectors (one per hyper-parameter combination) in ONE
    jitted, vmapped program: the whole 7x7 grid is a single device
    computation instead of 49 sequential training runs."""
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3, eps=1e-4)
    aug_views = views_d.shape[0]
    views_arg = views_d
    labels_arg = labels_d

    def loss_fn(weight, x, lam, labels_d, text_weights, init_weight):
        feats = x @ weight
        if bias is not None:
            feats = feats + bias
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        logits = 100.0 * feats @ text_weights
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = jnp.mean(-jnp.take_along_axis(logp, labels_d[:, None], 1)[:, 0])
        return ce + lam * jnp.sum(jnp.square(weight - init_weight))

    # init_weight/text_weights ride as ARGUMENTS (closure would bake them
    # into the compile payload — the no-closure rule, CLAUDE.md)
    @jax.jit
    def train_all(views_d, labels_d, lrs, lams, text_weights, init_weight):
        def train_one(lr, lam):
            opt_state = opt.init(init_weight)

            def epoch_body(e, carry):
                weight, opt_state = carry
                x = jax.lax.dynamic_index_in_dim(
                    views_d, (e + 1) % aug_views, axis=0, keepdims=False)
                lr_e = lr * 0.5 * (1.0 + jnp.cos(jnp.pi * e / epochs))
                grads = jax.grad(loss_fn)(weight, x, lam, labels_d,
                                          text_weights, init_weight)
                opt_state.hyperparams["learning_rate"] = lr_e
                updates, opt_state = opt.update(grads, opt_state, weight)
                return optax.apply_updates(weight, updates), opt_state

            weight, _ = jax.lax.fori_loop(0, epochs, epoch_body,
                                          (init_weight, opt_state))
            return weight

        return jax.vmap(train_one)(lrs, lams)  # [K, pre, emb]

    return train_all(views_arg, labels_arg, lrs, lams, text_weights,
                     init_weight)


@jax.jit
def _score_projectors(ws, vf, vl, text_weights, bias):
    """Validation top-1 per projector: ws [K, pre, emb] -> [K] accuracy.
    Module-level jit; the validation cache / labels / text head ride as
    ARGUMENTS per the no-closure rule (a closure would embed the whole
    validation feature matrix into the compile payload and recompile per
    grid_search call)."""
    feats = jnp.einsum("np,kpe->kne", vf, ws)
    if bias is not None:
        feats = feats + bias
    feats = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    logits = 100.0 * feats @ text_weights
    return jnp.mean(jnp.argmax(logits, -1) == vl[None, :], axis=-1)


def grid_search(
    views: List[np.ndarray],
    labels: np.ndarray,
    text_weights: jnp.ndarray,
    init_spec: ProjectorSpec,
    val_feats: np.ndarray,
    val_labels: np.ndarray,
    epochs: int,
    lr_grid=LR_GRID,
    lambda_grid=LAMBDA_GRID,
    feat_batch_size: int = 0,
    verbose: bool = True,
) -> Tuple[float, float, float]:
    """(lr, lambda) grid search scored by validation accuracy.

    TPU-native redesign of the reference's search
    (`/root/reference/methods/ProLIP.py:116-137,302-361`), which runs 49
    sequential training runs and re-encodes the validation set through the
    frozen encoder for every combination.  Here (a) validation features
    are encoded ONCE by the caller, and (b) for the full-batch regime the
    entire grid trains as a single vmapped program on device; the chunked
    (feat_batch_size > 0) regime falls back to sequential training runs."""
    if verbose:
        print("**** Searching for best lr **** \n")

    combos = [(lr, lam) for lr in lr_grid for lam in lambda_grid]

    if not feat_batch_size or feat_batch_size <= 0:
        views_d = jnp.asarray(np.stack(views, 0), jnp.float32)
        labels_d = jnp.asarray(labels, jnp.int32)
        lrs = jnp.asarray([c[0] for c in combos], jnp.float32)
        lams = jnp.asarray([c[1] for c in combos], jnp.float32)
        weights = _vmapped_grid_train(
            views_d, labels_d, text_weights, init_spec.weight,
            init_spec.bias, lrs, lams, epochs)  # [K, pre, emb]

        vf = jnp.asarray(val_feats, jnp.float32)
        vl = jnp.asarray(val_labels, jnp.int32)
        accs = np.asarray(_score_projectors(
            weights, vf, vl, text_weights, init_spec.bias)) * 100.0
        if verbose:
            for (lr, lam), acc in zip(combos, accs):
                print(f"lr={lr:g} lambda={lam:g} val_acc={acc:.4f}")
        best_i = int(np.argmax(accs))
        return combos[best_i][0], combos[best_i][1], float(accs[best_i])

    # memory fallback: sequential trainings.  The reference's search
    # ALWAYS trains full-batch with unscaled lambda regardless of
    # feat_batch_size (`/root/reference/methods/ProLIP.py:302-361` has no
    # chunking) — matching that keeps the selected (lr, lambda) identical
    best = (-1.0, lr_grid[0], lambda_grid[0])
    for lr, lam in combos:
        proj, _ = train_projector(
            views, labels, text_weights, init_spec, lr, lam, epochs,
            feat_batch_size=0, verbose=False)
        acc = projector_accuracy(proj, val_feats, val_labels, text_weights)
        if verbose:
            print(f"lr={lr:g} lambda={lam:g} val_acc={acc:.4f}")
        if acc > best[0]:
            best = (acc, lr, lam)
    return best[1], best[2], best[0]


def evaluate_multi_testsets(
    proj: ProjectorSpec,
    encode_split,
    test_views: Dict[str, object],
    text_weights_map: Dict[str, jnp.ndarray],
    default_weights: jnp.ndarray,
) -> Dict[str, float]:
    """Evaluate the trained projector on several test sets, each with its
    own (optional) text head — the reference's ImageNet branch
    (v2 / sketch / a / r, `/root/reference/methods/ProLIP.py:276-284`)
    generalized to any named collection of splits."""
    out: Dict[str, float] = {}
    for name, view in test_views.items():
        if view is None:
            out[name] = 0.0
            continue
        feats, labels = encode_split(view)
        weights = text_weights_map.get(name, default_weights)
        out[name] = projector_accuracy(proj, feats, labels, weights)
    return out


def resolve_lambda(cfg, shots: int) -> float:
    """lambda schedules: 1/N, 1/N^2, or the configured fallback."""
    if cfg.get("lambda_funct_1_N", False):
        return 1.0 / max(shots, 1)
    if cfg.get("lambda_funct_1_N2", False):
        return 1.0 / max(shots, 1) ** 2
    return float(cfg.get("lambda_v", 0.1))
