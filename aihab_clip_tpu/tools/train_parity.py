"""Training parity vs the reference implementation (ProLIP + PEFT).

The zero-shot half of the calibration harness (`tools/parity_check.py`)
proves the ENCODE pipelines agree; this module proves the TRAINERS do —
step for step, against the reference's own code running as a torch
oracle on CPU:

  * **ProLIP** (`/root/reference/methods/ProLIP.py:50-299`): the
    reference's actual `ProLIP.forward` is imported and executed (its
    hard `.cuda()` calls no-op'd for the CPU oracle), reading a feature
    cache written in ITS layout (`f{v}.pth`/`label.pth`), running its
    real 7x7 grid search / cosine-annealed Adam(eps=1e-4) loop, and
    saving its trained projector.  Our jitted trainer
    (`train/prolip.py`) runs on the same features; the gates compare
    the selected grid cell, the per-epoch CE/MSE trails, the final
    projector weights, and test accuracy.
  * **PEFT** (`/root/reference/methods/PEFT_openclip.py:147-384`): a
    torch loop reproducing the reference's exact step semantics (CE
    over ``100 * normalize(enc(x)) @ text_weights``, per-step text-head
    recompute under ``tune_text``, Adam + per-epoch cosine schedule)
    drives the reference's vendored CLIP on the SAME pixel batches our
    jitted `make_train_step` consumes, with identical trainable sets.
    Per-step losses and the final trainable parameters are compared.

Both run today on tiny random-init towers (in-suite:
`tests/test_train_parity.py`); pointed at a real checkpoint + the CS
dataset (`parity_check --weights <ckpt> --train`), the same code is the
full training half of the 0.1% accuracy-parity north star.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import tempfile
import types
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

REF_ROOT = Path("/root/reference")


# ---------------------------------------------------------------------------
# reference import plumbing
# ---------------------------------------------------------------------------

def _import_ref_methods():
    """Import `/root/reference/methods` as a package so its relative
    imports (`from .utils import ...`) resolve, without putting the
    reference repo root on sys.path."""
    import importlib

    if "ref_methods" not in sys.modules:
        pkg = types.ModuleType("ref_methods")
        pkg.__path__ = [str(REF_ROOT / "methods")]
        sys.modules["ref_methods"] = pkg
    return importlib.import_module("ref_methods.ProLIP")


@contextlib.contextmanager
def _cpu_cuda_patch():
    """No-op `.cuda()` so the reference's hard CUDA assumptions
    (`ProLIP.forward` calls `model.cuda()` / `tensor.cuda()`,
    `/root/reference/methods/ProLIP.py:79,199,229`) run on the CPU
    oracle unchanged."""
    import torch

    t_cuda, m_cuda = torch.Tensor.cuda, torch.nn.Module.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        torch.Tensor.cuda, torch.nn.Module.cuda = t_cuda, m_cuda


@contextlib.contextmanager
def _workdir(path):
    old = os.getcwd()
    os.chdir(path)
    try:
        yield
    finally:
        os.chdir(old)


# ---------------------------------------------------------------------------
# shared fixtures
# ---------------------------------------------------------------------------

def _copy_tree(tree):
    """Deep-copy every array leaf (owned storage, not torch views)."""
    import jax

    return jax.tree_util.tree_map(lambda a: np.array(a, copy=True), tree)


def _synthetic_split(resolution: int, n_train: int = 6, n_test: int = 6,
                     image_size: Optional[int] = None, seed: int = 0):
    """Synthetic CS-format data loaded exactly as the runner loads it.
    Returns dict with train/val/test uint8 image arrays + labels."""
    from ..data import load_folders, make_synthetic_cs_dataset

    tmp = tempfile.mkdtemp(prefix="train_parity_data_")
    synth = make_synthetic_cs_dataset(
        tmp, n_train_per_class=n_train, n_test_per_class=n_test,
        image_size=image_size or max(resolution, 64), seed=seed)
    resize = max(resolution + resolution // 2, 96)
    tr = load_folders([synth["train_dir"]], [synth["index_file_name"]],
                      resize_dim=resize)
    te = load_folders([synth["test_dir"]], [synth["index_file_name"]],
                      resize_dim=resize)
    # deterministic half/half val-test split of the test folder
    n = len(te.labels)
    val_idx = np.arange(0, n, 2)
    test_idx = np.arange(1, n, 2)
    return {
        "train_images": np.asarray(tr.images), "train_labels": np.asarray(tr.labels),
        "val_images": np.asarray(te.images)[val_idx],
        "val_labels": np.asarray(te.labels)[val_idx],
        "test_images": np.asarray(te.images)[test_idx],
        "test_labels": np.asarray(te.labels)[test_idx],
    }


def _torch_preprocess(images_u8: np.ndarray, resolution: int) -> "object":
    """Reference eval preprocessing -> torch NCHW float tensor."""
    import torch

    from .parity_check import reference_preprocess

    x = reference_preprocess(images_u8, resolution)          # NHWC float32
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).contiguous()


def _torch_encode_pre(t_model, images_u8: np.ndarray, resolution: int,
                      batch: int = 64) -> np.ndarray:
    """Reference pipeline pre-projection features (the cache contract —
    the reference's modified towers return pre-projection features,
    `/root/reference/clip/model.py:230-235`)."""
    import torch

    feats = []
    with torch.no_grad():
        x = _torch_preprocess(images_u8, resolution)
        for i in range(0, x.shape[0], batch):
            feats.append(t_model.encode_image(x[i:i + batch]).float())
    return torch.cat(feats, 0).numpy()


def _our_encode_pre(j_model, params, images_u8: np.ndarray,
                    resolution: int, batch: int = 64) -> np.ndarray:
    """Our pipeline pre-projection features (device eval transform +
    jitted encode — the cache writer's path)."""
    import jax
    import jax.numpy as jnp

    from ..ops.preprocess import eval_transform

    @jax.jit
    def enc(p, im):
        x = eval_transform(im, resolution)
        return j_model.apply({"params": p}, x,
                             method=type(j_model).encode_image,
                             project=False)

    out = [np.asarray(enc(params, jnp.asarray(images_u8[i:i + batch])))
           for i in range(0, len(images_u8), batch)]
    return np.concatenate(out, 0)


# ---------------------------------------------------------------------------
# ProLIP training parity
# ---------------------------------------------------------------------------

_EPOCH_RE = re.compile(
    r"Acc: [\d.]+ \([\d.]+/[\d.]+\), Loss_ce: ([\d.eE+-]+), "
    r"Loss_mse: ([\d.eE+-]+)")


def _run_reference_prolip(t_model, feats: np.ndarray, labels: np.ndarray,
                          val_images, val_labels, test_images, test_labels,
                          text_weights: np.ndarray, resolution: int,
                          epochs: int, search: bool, lr: float, lam: float,
                          feat_batch_size: int, seed: int) -> Dict:
    """Execute the reference's actual `ProLIP.forward` on CPU and collect
    (selected lr/lambda, per-epoch CE/MSE, trained projector, test acc)."""
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    mod = _import_ref_methods()
    work = Path(tempfile.mkdtemp(prefix="train_parity_ref_"))
    cache_root = work / "cache"
    shots, ds_name, config_file = 4, "parity_ds", "parity_cfg"

    # feature cache in the reference's own layout
    # (`/root/reference/methods/ProLIP.py:103-113`)
    cdir = cache_root / f"features_ViTB16_{ds_name}" / f"{shots}_shot" / f"seed{seed}"
    cdir.mkdir(parents=True)
    torch.save(torch.from_numpy(feats).float(), cdir / "f0.pth")
    torch.save(torch.from_numpy(labels).long(), cdir / "label.pth")

    cfg = {
        "train_epoch": epochs, "backbone": "ViT-B/16",
        "root_path": str(cache_root), "dataset": ds_name, "aug_views": 1,
        "search_lr": search, "lr_v": lr, "lambda_v": lam,
        "lambda_funct_1_N": False, "lambda_funct_1_N2": False,
        "feat_batch_size": feat_batch_size, "save_checkpoints": True,
        "SUBSAMPLE_CLASSES": "all",
    }

    def loader(images, lab):
        return DataLoader(
            TensorDataset(_torch_preprocess(images, resolution),
                          torch.from_numpy(np.asarray(lab)).long()),
            batch_size=64, shuffle=False)

    tw = torch.from_numpy(np.asarray(text_weights)).float()
    method = mod.ProLIP(cfg)
    buf = io.StringIO()
    with _workdir(work), _cpu_cuda_patch(), contextlib.redirect_stdout(buf):
        loss, acc_test = method.forward(
            train_loader=None, val_loader=loader(val_images, val_labels),
            test_loader=loader(test_images, test_labels),
            test_loader_v2=None, test_loader_sketch=None, test_loader_a=None,
            test_loader_r=None, text_weights=tw, text_weights_a=None,
            text_weights_r=None, text_weights_before=None, model=t_model,
            state_dict=t_model.state_dict(), classnames=[str(i) for i in
                                                         range(20)],
            task=seed, shots=shots, config_file=config_file,
            test_config_path=None)
    out_text = buf.getvalue()

    sel_lr, sel_lam = lr, lam
    if search:
        sel_file = (work / "results_lr" / config_file /
                    f"{ds_name}{shots}_shot_lr.txt")
        sel_lr, sel_lam = (float(v) for v in sel_file.read_text().strip()
                           .splitlines()[-1].split(","))
    ckpt = (work / "trained_models" / config_file / ds_name /
            f"{shots}_shot" / f"{ds_name}_seed{seed}.pth")
    proj_w = torch.load(ckpt)["vit_proj"].numpy()
    trail = [(float(ce), float(mse))
             for ce, mse in _EPOCH_RE.findall(out_text)]
    # reference returns acc already in percent
    # (`/root/reference/methods/ProLIP.py:293`)
    return {"selected_lr": sel_lr, "selected_lambda": sel_lam,
            "trained_weight": proj_w, "test_acc": float(acc_test),
            "final_loss": float(loss), "epoch_trail": trail}


def run_prolip_train_parity(backbone: str = "ViT-B/16",
                            use_random: bool = True,
                            random_arch: str = "tiny",
                            weights: Optional[str] = None,
                            resolution: int = 64,
                            epochs: int = 25,
                            search: bool = True,
                            feat_batch_size: int = 0,
                            seed: int = 1,
                            verbose: bool = True) -> Dict:
    """Fixed-seed ProLIP both stacks: cache -> (7x7 search) -> train ->
    test acc, reference `forward` as the oracle.  Two arms:

    * **isolated**: our trainer consumes the TORCH features — pure
      trainer-math parity, tight gates;
    * **e2e**: each stack caches with its own encoder (exactly how the
      real calibration will run) — accuracy-level gates.
    """
    import jax.numpy as jnp

    from ..models import build_text_head
    from ..templates import gen_prompts
    from ..tokenizer import tokenize
    from ..train.prolip import (ProjectorSpec, grid_search,
                                projector_accuracy, train_projector)
    from .parity_check import build_models

    t_model, j_model, params, cfg = build_models(
        backbone, use_random, resolution, random_arch, weights)
    # the converter leaves un-permuted weights as zero-copy views of the
    # torch storage; the oracle's in-place Adam updates would otherwise
    # mutate OUR params mid-harness
    params = _copy_tree(params)
    if weights is not None:
        resolution = cfg.image_resolution

    # 12 test imgs/class -> 24-image val split: accs quantize coarsely
    # enough that both stacks' grid searches see identical rankings
    data = _synthetic_split(resolution, n_test=12)

    # identical prompt ensemble both sides; our text head is the shared
    # classifier (text-encode parity is gated by the zero-shot harness)
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    head = build_text_head(j_model, params, prompts, 20, tpc,
                           context_length=cfg.context_length)
    text_w = np.asarray(head["text_weights"], np.float32)   # [dim, C]

    t_feats = _torch_encode_pre(t_model, data["train_images"], resolution)
    t_val = _torch_encode_pre(t_model, data["val_images"], resolution)
    t_test = _torch_encode_pre(t_model, data["test_images"], resolution)

    ref = _run_reference_prolip(
        t_model, t_feats, data["train_labels"], data["val_images"],
        data["val_labels"], data["test_images"], data["test_labels"],
        text_w, resolution, epochs, search, lr=1e-3, lam=0.1,
        feat_batch_size=feat_batch_size, seed=seed)

    init_spec = ProjectorSpec.from_clip_params(params, is_vit=cfg.is_vit)
    tw_d = jnp.asarray(text_w)

    def run_ours(feats, vfeats, tefeats):
        if search:
            lr_v, lambda_v, best = grid_search(
                [feats], data["train_labels"], tw_d, init_spec, vfeats,
                data["val_labels"], epochs, feat_batch_size=feat_batch_size,
                verbose=False)
        else:
            lr_v, lambda_v, best = 1e-3, 0.1, float("nan")
        proj, stats = train_projector(
            [feats], data["train_labels"], tw_d, init_spec, lr_v, lambda_v,
            epochs, feat_batch_size=feat_batch_size, verbose=False)
        acc = projector_accuracy(proj, tefeats, data["test_labels"], tw_d)
        return {"selected_lr": lr_v, "selected_lambda": lambda_v,
                "val_best": best, "trained_weight": np.asarray(proj.weight),
                "test_acc": acc, "stats": stats}

    iso = run_ours(t_feats, t_val, t_test)

    j_feats = _our_encode_pre(j_model, params, data["train_images"], resolution)
    j_val = _our_encode_pre(j_model, params, data["val_images"], resolution)
    j_test = _our_encode_pre(j_model, params, data["test_images"], resolution)
    e2e = run_ours(j_feats, j_val, j_test)

    w_scale = float(np.abs(ref["trained_weight"]).mean())
    iso_trail = [(e["ce"], e["mse"]) for e in iso["stats"]["epochs"]]
    # reference prints at 4 decimal places; compare at that granularity
    trail_ce_max = max(
        (abs(a[0] - b[0]) for a, b in zip(ref["epoch_trail"], iso_trail)),
        default=float("inf"))

    report = {
        "ref_selected": (ref["selected_lr"], ref["selected_lambda"]),
        "iso_selected": (iso["selected_lr"], iso["selected_lambda"]),
        "e2e_selected": (e2e["selected_lr"], e2e["selected_lambda"]),
        "selected_cell_match_iso":
            (ref["selected_lr"], ref["selected_lambda"])
            == (iso["selected_lr"], iso["selected_lambda"]),
        "epochs_compared": len(ref["epoch_trail"]),
        "epoch_ce_max_abs_diff_iso": trail_ce_max,
        "trained_weight_max_abs_diff_iso": float(
            np.abs(ref["trained_weight"] - iso["trained_weight"]).max()),
        "trained_weight_mean_scale": w_scale,
        "ref_test_acc": ref["test_acc"],
        "iso_test_acc": iso["test_acc"],
        "e2e_test_acc": e2e["test_acc"],
        "test_acc_gap_iso": abs(ref["test_acc"] - iso["test_acc"]),
        "test_acc_gap_e2e": abs(ref["test_acc"] - e2e["test_acc"]),
    }
    report["gate_pass"] = gate_prolip_train(report)
    if verbose:
        print("\n==== ProLIP training parity ====")
        for k, v in report.items():
            print(f"{k}: {v}")
    return report


# Gates.  The isolated arm shares features with the oracle, so the only
# divergence sources are optimizer arithmetic and summation order —
# measured tiny@64: CE trail <=1e-3 (the reference's own print
# granularity is 1e-4), weight max|Δ| ~1e-5 over 25 Adam epochs.  The
# e2e arm inherits the <5e-5 encode drift amplified by training;
# accuracy-level gate only.
PROLIP_GATE_MAX_EPOCH_CE = 2e-3
PROLIP_GATE_MAX_WEIGHT_DIFF = 1e-3
PROLIP_GATE_MAX_ACC_GAP = 1.0       # percentage points


def gate_prolip_train(report: Dict) -> bool:
    return (report["selected_cell_match_iso"]
            and report["epoch_ce_max_abs_diff_iso"] <= PROLIP_GATE_MAX_EPOCH_CE
            and report["trained_weight_max_abs_diff_iso"]
            <= PROLIP_GATE_MAX_WEIGHT_DIFF
            and report["test_acc_gap_iso"] <= PROLIP_GATE_MAX_ACC_GAP
            and report["test_acc_gap_e2e"] <= PROLIP_GATE_MAX_ACC_GAP)


# ---------------------------------------------------------------------------
# PEFT training parity
# ---------------------------------------------------------------------------

def _torch_peft_oracle(t_model, batches: List, text_weights: np.ndarray,
                       prompt_tokens: Optional[np.ndarray],
                       num_classes: int, num_templates: int,
                       lr: float, epochs: int, tune_text: bool) -> Dict:
    """The reference PEFT step semantics
    (`/root/reference/methods/PEFT_openclip.py:240-279`) on the
    vendored torch CLIP: CE over 100*normalize(enc(x)) @ W, per-step
    text-head recompute under tune_text, Adam(default eps) + per-epoch
    cosine.  The reference's towers return PRE-projection features and
    its `torch.autocast('cuda')` arm is a precision policy, not math —
    the oracle projects explicitly and runs f32.

    `batches`: [(x_float NCHW torch tensor, labels torch tensor), ...]
    laid out as epochs x batches_per_epoch in order.
    """
    import torch
    import torch.nn.functional as F

    t_model.train()
    for name, p in t_model.named_parameters():
        if not tune_text:
            p.requires_grad = name.startswith("visual.")
        else:
            p.requires_grad = name != "logit_scale"

    trainable = [p for p in t_model.parameters() if p.requires_grad]
    opt = torch.optim.Adam(trainable, lr=lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, epochs)
    tw_fixed = torch.from_numpy(text_weights).float()
    tokens = (torch.from_numpy(prompt_tokens.astype(np.int64))
              if prompt_tokens is not None else None)

    def text_head():
        # `_compute_text_weights_from_tokens`
        # (`/root/reference/methods/PEFT_openclip.py:17-47`): encode,
        # normalize, [C, T, D] template mean, renormalize, transpose
        _, txt = t_model.encode_text(tokens)
        txt = F.normalize(txt.float(), dim=-1)
        txt = txt.reshape(num_classes, num_templates, -1).mean(1)
        return F.normalize(txt, dim=-1).t()

    losses, accs = [], []
    steps_per_epoch = len(batches) // epochs
    for e in range(epochs):
        for b in range(steps_per_epoch):
            x, y = batches[e * steps_per_epoch + b]
            feats = t_model.encode_image(x)
            feats = feats @ t_model.visual.proj
            feats = F.normalize(feats.float(), dim=-1)
            w = text_head() if tune_text else tw_fixed
            logits = 100.0 * feats @ w
            loss = F.cross_entropy(logits, y)
            accs.append(float((logits.argmax(-1) == y).float().mean()))
            opt.zero_grad()
            loss.backward()
            opt.step()
            losses.append(float(loss))
        sched.step()
    t_model.eval()
    named = {n: p.detach().numpy() for n, p in t_model.named_parameters()
             if p.requires_grad}
    return {"losses": losses, "accs": accs, "params": named}


def run_peft_train_parity(backbone: str = "ViT-B/16",
                          use_random: bool = True,
                          random_arch: str = "tiny",
                          weights: Optional[str] = None,
                          resolution: int = 64,
                          epochs: int = 2,
                          batches_per_epoch: int = 3,
                          batch_size: int = 16,
                          lr: float = 1e-3,
                          tune_text: bool = True,
                          verbose: bool = True) -> Dict:
    """Short PEFT run, both stacks, identical pixel batches.

    Our jitted `make_train_step` (augmentation disabled: center crop of
    same-size inputs, no flip/rotation -> deterministic normalize) vs
    the torch oracle above, full-tower unlock so the trainable sets are
    structurally identical.  Gates: per-step loss trail, final
    trainable-parameter drift, trainable-count match.
    """
    import torch

    import jax
    import jax.numpy as jnp

    from ..models import build_text_head
    from ..ops.fast_warp import fast_train_transform
    from ..templates import gen_prompts
    from ..tokenizer import tokenize
    from ..train.peft import (PEFTConfig, build_lock_mask, make_train_step,
                              partition_params, trainable_report)
    from ..train.prolip import cosine_lr
    from .parity_check import build_models

    t_model, j_model, params, cfg = build_models(
        backbone, use_random, resolution, random_arch, weights)
    # the converter leaves un-permuted weights as zero-copy views of the
    # torch storage; the oracle's in-place Adam updates would otherwise
    # mutate OUR params mid-harness
    params = _copy_tree(params)
    if weights is not None:
        resolution = cfg.image_resolution

    # images already AT the train resolution: the in-step center-crop
    # transform reduces to plain normalization, so both stacks consume
    # bit-identical pixels (resize parity is the zero-shot gate's job)
    data = _synthetic_split(resolution, image_size=resolution)

    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    tokens = tokenize(prompts, context_length=cfg.context_length,
                      truncate=True)
    head = build_text_head(j_model, params, prompts, 20, tpc,
                           context_length=cfg.context_length)
    text_w = np.asarray(head["text_weights"], np.float32)

    n_steps = epochs * batches_per_epoch
    rng = np.random.default_rng(0)
    order = rng.permutation(len(data["train_labels"]))
    base = np.arange(batch_size)
    # fixed-size batches in a fixed order; tiny sets wrap deterministically
    idx = [np.take(order, base + s * batch_size, mode="wrap")
           for s in range(n_steps)]

    peft_cfg = PEFTConfig(
        resolution=resolution, num_classes=20, lr=lr, epochs=epochs,
        crop_mode="center", flip=False, rotation=False,
        tune_text=tune_text, num_templates=tpc,
        compute_dtype=jnp.float32, fused_prefix=0)
    n_vis = cfg.vision_layers if isinstance(cfg.vision_layers, int) else 4
    n_txt = cfg.transformer_layers
    mask = build_lock_mask(params, vision_layers=cfg.vision_layers,
                           text_layers=n_txt,
                           unlocked_groups=n_vis + 2, tune_text=tune_text,
                           unlocked_text_layers=(n_txt + 2
                                                 if tune_text else 0),
                           is_vit=cfg.is_vit)
    trainable, frozen = partition_params(params, mask)
    rep = trainable_report(mask)

    tokens_d = jnp.asarray(tokens)
    opt, step = make_train_step(j_model, peft_cfg,
                                jnp.asarray(text_w) if not tune_text else None,
                                tokens_d if tune_text else None)
    opt_state = opt.init(trainable)

    # oracle consumes the EXACT floats our in-step transform produces
    key = jax.random.PRNGKey(0)
    torch_batches, our_batches = [], []
    for s, ids in enumerate(idx):
        imgs = data["train_images"][ids]
        labs = data["train_labels"][ids]
        k = jax.random.fold_in(key, s)
        x = np.asarray(fast_train_transform(
            jnp.asarray(imgs), k, resolution, crop_mode="center",
            flip=False, rotation=False, dtype=jnp.float32))
        torch_batches.append(
            (torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).contiguous(),
             torch.from_numpy(labs).long()))
        our_batches.append((imgs, labs, k))

    oracle = _torch_peft_oracle(
        t_model, torch_batches, text_w,
        tokens if tune_text else None, 20, tpc, lr, epochs, tune_text)

    our_losses = []
    valid = jnp.ones((batch_size,), bool)
    for s, (imgs, labs, k) in enumerate(our_batches):
        lr_e = cosine_lr(lr, s // batches_per_epoch, epochs)
        trainable, opt_state, metrics = step(
            trainable, frozen, opt_state, jnp.asarray(imgs),
            jnp.asarray(labs), valid, k, lr_e)
        our_losses.append(float(metrics["loss"]))

    # map our final trainable leaves onto the torch ones via the
    # state-dict converter run in REVERSE on shapes: compare global
    # magnitude instead of key-by-key (layout differs; the converter
    # round-trip tests own key mapping)
    flat = jax.tree_util.tree_leaves(trainable)
    our_norm = float(np.sqrt(sum(float(jnp.sum(l.astype(jnp.float32) ** 2))
                                 for l in flat)))
    t_norm = float(np.sqrt(sum((v.astype(np.float64) ** 2).sum()
                               for v in oracle["params"].values())))

    loss_diffs = [abs(a - b) for a, b in zip(oracle["losses"], our_losses)]
    report = {
        "n_steps": n_steps,
        "tune_text": tune_text,
        "torch_trainable_tensors": len(oracle["params"]),
        "ours_trainable_tensors": rep["num_trainable"],
        "loss_trail_ref": [round(v, 6) for v in oracle["losses"]],
        "loss_trail_ours": [round(v, 6) for v in our_losses],
        "loss_max_abs_diff": max(loss_diffs),
        "trained_param_norm_rel_diff":
            abs(our_norm - t_norm) / max(t_norm, 1e-12),
    }
    report["gate_pass"] = gate_peft_train(report)
    if verbose:
        print("\n==== PEFT training parity ====")
        for k_, v in report.items():
            print(f"{k_}: {v}")
    return report


# Measured tiny@64 f32: per-step loss |Δ| ~1e-5 grows to ~1e-4 by step 6
# (Adam normalization amplifies float-level grad drift); 10x margin.
PEFT_GATE_MAX_LOSS_DIFF = 5e-3
PEFT_GATE_MAX_NORM_REL_DIFF = 1e-3


def gate_peft_train(report: Dict) -> bool:
    return (report["loss_max_abs_diff"] <= PEFT_GATE_MAX_LOSS_DIFF
            and report["trained_param_norm_rel_diff"]
            <= PEFT_GATE_MAX_NORM_REL_DIFF
            and report["torch_trainable_tensors"]
            == report["ours_trainable_tensors"])


# ---------------------------------------------------------------------------
# combined entry (parity_check --train)
# ---------------------------------------------------------------------------

def run_train_parity(backbone: str = "ViT-B/16", use_random: bool = True,
                     random_arch: str = "tiny",
                     weights: Optional[str] = None,
                     resolution: int = 64, verbose: bool = True,
                     parity_md: Optional[str] = None) -> Dict:
    """ProLIP + PEFT training parity in one command; returns a combined
    report with an overall gate."""
    prolip = run_prolip_train_parity(
        backbone, use_random, random_arch, weights, resolution,
        verbose=verbose)
    peft = run_peft_train_parity(
        backbone, use_random, random_arch, weights, resolution,
        verbose=verbose)
    try:
        import transformers  # noqa: F401 — oracle dependency

        siglip = run_peft_train_parity_siglip(verbose=verbose)
    except ImportError:
        siglip = {"gate_pass": True, "skipped": "transformers unavailable"}
    report = {"prolip": prolip, "peft": peft, "peft_siglip": siglip,
              "gate_pass": (prolip["gate_pass"] and peft["gate_pass"]
                            and siglip["gate_pass"])}
    if parity_md:
        from .parity_check import _append_parity_section

        flat = {f"prolip.{k}": v for k, v in prolip.items()}
        flat.update({f"peft.{k}": v for k, v in peft.items()})
        flat["gate_pass"] = report["gate_pass"]
        _append_parity_section(parity_md, backbone + " [train]", weights,
                               flat)
    if verbose:
        print("\ntraining-parity gate:",
              "PASS" if report["gate_pass"] else "FAIL")
    return report


# ---------------------------------------------------------------------------
# PEFT training parity — SigLIP family (the reference's DEFAULT backbone)
# ---------------------------------------------------------------------------

def _tiny_hf_siglip():
    """Tiny HF SiglipModel (the torch oracle for the default-backbone
    family; `models/convert_hf.py` is the weight bridge)."""
    import torch
    import transformers

    cfg = transformers.SiglipConfig.from_text_vision_configs(
        transformers.SiglipTextConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16,
            vocab_size=512),
        transformers.SiglipVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8),
    )
    torch.manual_seed(0)
    return transformers.SiglipModel(cfg).train()


def run_peft_train_parity_siglip(epochs: int = 2,
                                 batches_per_epoch: int = 3,
                                 batch_size: int = 8,
                                 lr: float = 1e-3,
                                 tune_text: bool = True,
                                 num_classes: int = 20,
                                 num_templates: int = 2,
                                 verbose: bool = True) -> Dict:
    """Short PEFT run on a SigLIP tower, both stacks, identical pixel
    batches — the reference's default backbone family
    (`configs/base.yaml:33` names a SigLIP2 tag; its PEFT step semantics
    are backbone-independent, `PEFT_openclip.py:240-279`).  The torch
    oracle is HF ``SiglipModel`` (the same oracle the forward-parity
    suite uses); prompts are shared token-id matrices, so this isolates
    the TRAIN math (tokenizer parity is gated separately)."""
    import torch
    import torch.nn.functional as F

    import jax
    import jax.numpy as jnp

    from ..models.convert_hf import (hf_siglip_state_dict_to_params,
                                     siglip_config_from_hf)
    from ..models.siglip import SigLIPModel, siglip_normalize_stats
    from ..ops.fast_warp import fast_train_transform
    from ..train.peft import (PEFTConfig, build_lock_mask, make_train_step,
                              partition_params, trainable_report)
    from ..train.prolip import cosine_lr

    t_model = _tiny_hf_siglip()
    cfg = siglip_config_from_hf(t_model.config)
    params = _copy_tree(hf_siglip_state_dict_to_params(
        t_model.state_dict(), cfg.vision_width))
    j_model = SigLIPModel(cfg)
    resolution = cfg.image_resolution

    data = _synthetic_split(resolution, image_size=resolution)
    rng = np.random.default_rng(3)
    tokens = rng.integers(1, cfg.vocab_size,
                          size=(num_classes * num_templates,
                                cfg.context_length)).astype(np.int32)

    nmean, nstd = siglip_normalize_stats()

    n_steps = epochs * batches_per_epoch
    order = rng.permutation(len(data["train_labels"]))
    base = np.arange(batch_size)
    idx = [np.take(order, base + s * batch_size, mode="wrap")
           for s in range(n_steps)]
    labels_mod = data["train_labels"] % num_classes

    peft_cfg = PEFTConfig(
        resolution=resolution, num_classes=num_classes, lr=lr,
        epochs=epochs, crop_mode="center", flip=False, rotation=False,
        tune_text=tune_text, num_templates=num_templates,
        compute_dtype=jnp.float32, fused_prefix=0)
    mask = build_lock_mask(params, cfg.vision_layers, cfg.text_layers,
                           unlocked_groups=cfg.vision_layers + 2,
                           tune_text=tune_text,
                           unlocked_text_layers=(cfg.text_layers + 2
                                                 if tune_text else 0))
    trainable, frozen = partition_params(params, mask)
    rep = trainable_report(mask)

    # fixed text head for the frozen-text arm: OUR initial head, shared
    if not tune_text:
        from ..models.text_head import compute_text_weights

        text_w = np.asarray(compute_text_weights(
            j_model, params, jnp.asarray(tokens), num_classes,
            num_templates), np.float32)
    else:
        text_w = None

    opt, step = make_train_step(
        j_model, peft_cfg,
        jnp.asarray(text_w) if text_w is not None else None,
        jnp.asarray(tokens) if tune_text else None)
    opt_state = opt.init(trainable)

    key = jax.random.PRNGKey(0)
    batches = []
    for s, ids in enumerate(idx):
        imgs = data["train_images"][ids]
        labs = labels_mod[ids]
        k = jax.random.fold_in(key, s)
        x = np.asarray(fast_train_transform(
            jnp.asarray(imgs), k, resolution, crop_mode="center",
            flip=False, rotation=False, dtype=jnp.float32,
            mean=nmean, std=nstd))
        batches.append((imgs, labs, k, x))

    # torch oracle: reference PEFT step semantics on HF SiglipModel
    for name, p in t_model.named_parameters():
        if not tune_text:
            p.requires_grad = name.startswith("vision_model.")
        else:
            p.requires_grad = name not in ("logit_scale", "logit_bias")
    opt_t = torch.optim.Adam(
        [p for p in t_model.parameters() if p.requires_grad], lr=lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt_t, epochs)
    ids_t = torch.from_numpy(tokens.astype(np.int64))

    def torch_text_head():
        txt = t_model.text_model(input_ids=ids_t).pooler_output
        txt = F.normalize(txt.float(), dim=-1)
        txt = txt.reshape(num_classes, num_templates, -1).mean(1)
        return F.normalize(txt, dim=-1).t()

    t_losses = []
    for s, (imgs, labs, k, x) in enumerate(batches):
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        feats = t_model.vision_model(pixel_values=xt).pooler_output
        feats = F.normalize(feats.float(), dim=-1)
        w = torch_text_head() if tune_text else torch.from_numpy(text_w)
        logits = 100.0 * feats @ w
        loss = F.cross_entropy(logits, torch.from_numpy(labs).long())
        opt_t.zero_grad()
        loss.backward()
        opt_t.step()
        t_losses.append(float(loss.detach()))
        if (s + 1) % batches_per_epoch == 0:
            sched.step()

    our_losses = []
    valid = jnp.ones((batch_size,), bool)
    for s, (imgs, labs, k, x) in enumerate(batches):
        lr_e = cosine_lr(lr, s // batches_per_epoch, epochs)
        trainable, opt_state, metrics = step(
            trainable, frozen, opt_state, jnp.asarray(imgs),
            jnp.asarray(labs), valid, k, lr_e)
        our_losses.append(float(metrics["loss"]))

    from flax import traverse_util

    flat_mask = traverse_util.flatten_dict(mask)
    flat_params = traverse_util.flatten_dict(params)
    our_elems = int(sum(np.prod(np.shape(flat_params[k]))
                        for k, v in flat_mask.items() if v))
    t_elems = int(sum(p.numel() for p in t_model.parameters()
                      if p.requires_grad))
    diffs = [abs(a - b) for a, b in zip(t_losses, our_losses)]
    report = {
        "family": "siglip",
        "n_steps": n_steps,
        "tune_text": tune_text,
        # tensor counts differ by layout granularity (our MAP head
        # splits HF's fused in_proj into q/k/v); ELEMENT counts gate
        "torch_trainable_params": t_elems,
        "ours_trainable_params": our_elems,
        "ours_trainable_tensors": rep["num_trainable"],
        "loss_trail_ref": [round(v, 6) for v in t_losses],
        "loss_trail_ours": [round(v, 6) for v in our_losses],
        "loss_max_abs_diff": max(diffs),
    }
    report["gate_pass"] = (
        report["loss_max_abs_diff"] <= PEFT_GATE_MAX_LOSS_DIFF
        and report["torch_trainable_params"]
        == report["ours_trainable_params"])
    if verbose:
        print("\n==== PEFT training parity (SigLIP) ====")
        for k_, v in report.items():
            print(f"{k_}: {v}")
    return report
