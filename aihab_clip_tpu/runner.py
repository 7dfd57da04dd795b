"""Top-level run orchestration: config -> model+text head -> loaders ->
(inspect | cache | ProLIP | PEFT) -> metrics/logging.

This is the library core behind ``main.py`` (CLI) and
``tools/run_ft_sweep.py`` (sweep launcher), mirroring the reference's
runner flow (`/root/reference/main.py:64-197`) with the TPU-native stack.

Backend names keep the reference's config vocabulary:
  * ``clip_backend: openai``   -> OpenAI CLIP zoo (ViT/RN; ProLIP path)
  * ``clip_backend: openclip`` -> extended registry (PEFT path).  Without
    a locally available checkpoint this falls back to random init with a
    warning (zero-egress environments), keeping every pipeline runnable.
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .backend import dispatch_backend

from .cache import (
    cache_embeddings,
    cache_features_from_loader,
    feature_cache_dir,
    feature_cache_exists_sharded,
    read_preprojection_cache,
)
from .data import build_loaders
from .models import CLIPModel, build_text_head, load as load_model
from .taxonomy import CS_CLASSNAMES, NUM_L2, REASSIGN_LABEL_NAME_L3, l3_to_l2_array
from .templates import CS_TEMPLATES, gen_prompts
from .train.evaluate import evaluate
from .train.peft import PEFTConfig, finetune
from .train.prolip import (
    ProjectorSpec,
    grid_search,
    projector_accuracy,
    resolve_lambda,
    train_projector,
)
from .utils import RunLogger, save_checkpoint, save_projector


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)


def compute_dtype_for_backend() -> Any:
    return jnp.bfloat16 if dispatch_backend() == "tpu" else jnp.float32


def init_clip_and_text_head(cfg) -> Dict[str, Any]:
    """Load the model and build the CS text head.

    Returns a bundle dict: {model, params, config, text_weights,
    text_weights_before, prompt_tokens, num_templates, example_prompts,
    resolution, backbone_name}.  Reference contract:
    `/root/reference/aihab_utils/model_init.py:115-160`.
    """
    backend = str(cfg.get("clip_backend", "openai")).lower()
    dtype = compute_dtype_for_backend()

    if backend == "openclip":
        backbone = cfg.get("open_clip_model", cfg.get("backbone", "ViT-B/16"))
        pretrained = cfg.get("open_clip_pretrained", None)
        if pretrained not in (None, "", "openai"):
            # the reference forwards this tag to open_clip's weight hub;
            # this build's zoo carries the OpenAI checkpoints (and local
            # HF SigLIP snapshots) — other pretrain tags have no converter
            print(f"[warn] open_clip_pretrained='{pretrained}' is not "
                  "available in this build; loading the zoo weights for "
                  f"'{backbone}' instead")
        use_hier = bool(cfg.get("use_hierarchical_prompts", True))
        use_desc = bool(cfg.get("use_descriptive_prompts", True))
        prompts, tpc = gen_prompts(use_hierarchy=use_hier,
                                   use_descriptive=use_desc)
    else:
        backbone = cfg.get("backbone", "RN50")
        prompts = None
        tpc = len(CS_TEMPLATES)

    allow_random = bool(cfg.get("allow_random_weights", False))
    try:
        bundle = load_model(backbone, dtype=dtype,
                            cache_dir=cfg.get("clip_cache_dir", None),
                            remat=bool(cfg.get("remat", False)),
                            allow_random_fallback=allow_random)
    except Exception as exc:  # zero-egress fallback
        from .models.zoo import SigLIPAssetsMissingError

        if str(backbone).startswith("random:"):
            raise
        if isinstance(exc, SigLIPAssetsMissingError):
            # hard, early error: SigLIP text encoding without the
            # snapshot's tokenizer would silently produce wrong token ids
            # (set `allow_random_weights: true` to develop without assets)
            raise
        arch = cfg.get("fallback_arch", "ViT-B/16")
        print(f"[warn] could not load weights for '{backbone}' ({exc}); "
              f"falling back to random-init {arch}")
        bundle = load_model(f"random:{arch}", dtype=dtype,
                            remat=bool(cfg.get("remat", False)))

    if prompts is None:
        # flat prompt ensemble over L3 classnames (openai path)
        prompts = [t.format(c.replace("_", " "))
                   for c in CS_CLASSNAMES for t in CS_TEMPLATES]

    num_classes = len(CS_CLASSNAMES)
    head = build_text_head(bundle.model, bundle.params, prompts,
                           num_classes, tpc,
                           tokenize_fn=getattr(bundle, "tokenize_fn", None))

    example_class = "Improved Grassland"
    ei = CS_CLASSNAMES.index(example_class)
    example_prompts = prompts[ei * tpc:(ei + 1) * tpc]

    return {
        "backend": backend,
        "backbone_name": str(backbone),
        "model": bundle.model,
        "params": bundle.params,
        "config": bundle.config,
        "source": bundle.source,
        # use_model_preprocess: openclip backends default to the model's
        # native resolution (reference `/root/reference/main.py:91-94`);
        # otherwise the dataset config's resolution wins
        "resolution": (
            int(bundle.config.image_resolution)
            if backend == "openclip" and bool(cfg.get("use_model_preprocess",
                                                      True))
            else int(cfg.get("data", {}).get("preprocessing", {})
                     .get("resolution", bundle.config.image_resolution))),
        "text_weights": head["text_weights"],
        "text_weights_before": head["text_weights_before"],
        "prompt_tokens": head["prompt_tokens"],
        "num_templates": tpc,
        "example_prompts": example_prompts,
        "num_classes": num_classes,
    }


def inspect(cfg, bundle, loaders, max_show: int = 4) -> None:
    """Inspection mode (`--inspect_only`): print config, pipeline, batches,
    few-shot selection, text-head summary.  Reference:
    `/root/reference/aihab_utils/model_init.py:163-248`."""
    print("\n==== Loaded Config ====")
    print(cfg)

    pp = cfg.get("data", {}).get("preprocessing", {})
    aug = pp.get("augmentations", {})
    print("\n==== Transform pipeline (device-side) ====")
    crop = ("bottom" if aug.get("bottom_crop") else
            "random_resized(scale 0.5-1.0)" if aug.get("random_crop")
            else "resize+center")
    print(f"train: fused affine warp [crop={crop}, flip={bool(aug.get('flip'))}, "
          f"rotation(±30°)={bool(aug.get('rotation'))}] -> bicubic sample "
          f"@{bundle['resolution']} -> CLIP normalize")
    print(f"eval : bicubic AA resize -> center crop @{bundle['resolution']} "
          f"-> CLIP normalize")

    info = loaders.info
    print("\n==== Train Batch Sample ====")
    batch = next(loaders.train.batches())
    print(f"images: {batch.images.shape}  dtype={batch.images.dtype}")
    shown = batch.labels[batch.valid][:max_show].tolist()
    print(f"labels: {shown}")
    print(f"label names: {[REASSIGN_LABEL_NAME_L3[int(y)] for y in shown]}")

    print("\n==== Loader Sizes ====")
    print(f"train size: {info['train_size']}  num_batches: {info['train_batches']}")
    print(f"validation size: {info['val_size']}  num_batches: {info['val_batches']}")
    if info.get("is_few_shot"):
        print(f"few-shot mode: {info['shots']} per class")
        print("selected indices by class (absolute indices into train array):")
        for cls_id in sorted((info.get("selection_by_class") or {})):
            print(f"  class {cls_id}: {info['selection_by_class'][cls_id]}")

    print("\n==== Test Batch Sample ====")
    batch_te = next(loaders.test.batches())
    print(f"images: {batch_te.images.shape}  dtype={batch_te.images.dtype}")
    shown_te = batch_te.labels[batch_te.valid][:max_show].tolist()
    print(f"labels: {shown_te}")
    print(f"label names: {[REASSIGN_LABEL_NAME_L3[int(y)] for y in shown_te]}")

    print("\n==== CLIP Init & Text Head ====")
    print({"backend": bundle["backend"], "backbone": bundle["backbone_name"],
           "weights_source": bundle["source"],
           "platform": dispatch_backend(),
           "devices": len(jax.devices())})
    print("\nText head summary:")
    tw = bundle["text_weights"]
    twb = bundle["text_weights_before"]
    print({"num_classes": bundle["num_classes"],
           "num_templates": bundle["num_templates"],
           "text_weights.shape": tuple(tw.shape),
           "text_weights_before.shape":
               tuple(twb.shape) if twb is not None else None,
           "dtype": str(tw.dtype)})
    print("sample class: Improved Grassland")
    print("sample prompts (all templates for class):", bundle["example_prompts"])


def _l2_eval_ctx(cfg, num_classes: int) -> Optional[Dict]:
    ft_cfg = cfg.get("finetune", {})
    if not bool(ft_cfg.get("eval_l2", False)):
        return None
    subset = cfg.get("subset_l3", []) or []
    if subset:
        print("[warn] L2 eval disabled because subset_l3 is set.")
        return None
    table = l3_to_l2_array()
    if len(table) != num_classes:
        print("[warn] L2 eval disabled due to L3 mapping size mismatch.")
        return None
    mode = str(ft_cfg.get("l2_eval_mode", "argmax")).lower()
    return {
        "l3_to_l2": table,
        "num_l2": NUM_L2,
        "reduce": "mean",
        "topk": (1,) if mode == "argmax" else (1, 3),
        "mode": mode,
        "return_confusion_matrix": False,
    }


def _maybe_restore_checkpoint(cfg, bundle) -> Optional[str]:
    """Restore params from finetune.checkpoint (path or 'latest').

    The reference defines these config stubs but never wires them
    (`/root/reference/configs/base.yaml:15-16`); here they work."""
    from .utils import latest_checkpoint, load_checkpoint

    ft_cfg = cfg.get("finetune", {})
    ckpt = ft_cfg.get("checkpoint", None)
    if not ckpt:
        return None
    path = latest_checkpoint(cfg) if str(ckpt) == "latest" else Path(ckpt)
    if path is None:
        print("[ckpt] no checkpoint found to restore")
        return None
    restored = load_checkpoint(path, bundle["params"])
    bundle["params"] = restored["params"]
    print(f"[ckpt] restored params from {path}")
    return str(path)


def _resolve_device_dataset(cfg, loaders):
    """device_dataset: true | false | 'chunked' | 'auto'.

    'auto' stages the train split in HBM and scans the epoch when it fits
    (measured faster than per-step dispatch, PERF_NOTES.md); when it does
    NOT fit, it falls back to double-buffered HBM chunks ('chunked': the
    next chunk's upload overlaps the current chunk's on-device scan,
    step-for-step identical training)."""
    setting = cfg.get("device_dataset", "auto")
    if isinstance(setting, bool):
        return setting
    s = str(setting).lower()
    if s == "chunked":
        return "chunked"
    if s != "auto":
        return False
    if dispatch_backend() != "tpu":
        return False  # CPU runs keep the host loop (no dispatch latency)
    train_bytes = (loaders.train.num_samples
                   * int(np.prod(loaders.train.dataset.images.shape[1:])))
    # leave HBM room for params/activations; larger splits stream in chunks
    return True if train_bytes <= 4 * 1024 ** 3 else "chunked"


def _resolve_fused_prefix(setting) -> int:
    """``finetune.fused_prefix``: 'auto' (default; resolved from
    unlocked_groups inside ``finetune`` — see ``peft_fused_prefix_len``),
    'off'/false/0 (always the canonical module), or an explicit frozen
    bottom-block count."""
    if isinstance(setting, bool):
        return -1 if setting else 0
    s = str(setting).lower()
    if s == "auto":
        return -1
    if s in ("off", "false", "none"):
        return 0
    return int(setting)


def run_peft(cfg, bundle, loaders, logger=None, config_file: str = "cfg"
             ) -> Dict[str, Any]:
    """OpenCLIP-style partial-unfreeze fine-tune (reference FTOpenCLIP)."""
    ft_cfg = cfg.get("finetune", {})
    pp = cfg["data"]["preprocessing"]
    aug = pp.get("augmentations", {})
    tune_text = bool(ft_cfg.get("tune_text", False))

    # resume=true: continue an interrupted run (params + optimizer state +
    # epoch position restored INSIDE finetune, bitwise-continuous);
    # otherwise finetune.checkpoint is a params-only warm start
    resume_from = None
    restored_from = None
    if bool(ft_cfg.get("resume", False)):
        from .utils import latest_checkpoint

        ckpt = ft_cfg.get("checkpoint", None) or "latest"
        resume_from = (latest_checkpoint(cfg) if str(ckpt) == "latest"
                       else Path(ckpt))
        if resume_from is None:
            print("[resume] no checkpoint found; starting fresh")
    else:
        restored_from = _maybe_restore_checkpoint(cfg, bundle)

    if bool(ft_cfg.get("eval_only", False)):
        # evaluation-only: no training, full metric stack on the test split
        from .train.evaluate import evaluate
        from .train.tracker import ClassificationTracker

        if resume_from is not None:
            # finetune.resume + eval_only: evaluate the CHECKPOINT (the
            # restore normally happens inside finetune, which eval_only
            # bypasses)
            from .utils import load_checkpoint

            restored = load_checkpoint(Path(resume_from),
                                       bundle["params"], None)
            bundle["params"] = restored["params"]
            restored_from = str(resume_from)
            print(f"[eval_only] restored params from {resume_from}")

        tracker = ClassificationTracker()
        test = evaluate(
            bundle["model"], bundle["params"], loaders.test,
            bundle["text_weights"], bundle["resolution"],
            bundle["num_classes"],
            compute_dtype=compute_dtype_for_backend(),
            return_confusion_matrix=True,
            l2_eval_ctx=_l2_eval_ctx(cfg, bundle["num_classes"]),
            tracker=tracker, mesh=_build_mesh(cfg))
        print(f"[eval_only] top1={test['top1']:.4f} top3={test['top3']:.4f} "
              f"f1={test['f1']:.4f} mcc={test['mcc']:.4f}")
        if logger is not None:
            tracker.save_classification(logger)
        if bool(ft_cfg.get("cache_embeddings", False)):
            split = str(ft_cfg.get("cache_embeddings_split", "test")).lower()
            view = {"train": loaders.train, "val": loaders.val,
                    "test": loaders.test}.get(split, loaders.test)
            cache_embeddings(cfg, bundle["model"], bundle["params"], view,
                             bundle["resolution"], split=split,
                             checkpoint_path=restored_from)
        return {"val": None, "test": test, "params": bundle["params"],
                "opt_state": None, "tracker": tracker, "report": None,
                "mask": None}

    pcfg = PEFTConfig(
        resolution=bundle["resolution"],
        num_classes=bundle["num_classes"],
        lr=float(cfg.get("lr_v", 5e-5)),
        epochs=int(cfg.get("train_epoch", 1)),
        crop_mode=("bottom" if aug.get("bottom_crop") else
                   "random" if aug.get("random_crop") else "center"),
        flip=bool(aug.get("flip", False)),
        rotation=bool(aug.get("rotation", False)),
        tune_text=tune_text,
        num_templates=bundle["num_templates"],
        compute_dtype=compute_dtype_for_backend(),
        val_interval=int(ft_cfg.get("val_interval", 0)),
        aug_impl=str(cfg.get("aug_impl", "fast")),
        device_dataset=_resolve_device_dataset(cfg, loaders),
        checkpoint_interval=int(ft_cfg.get("checkpoint_interval", 0)),
        fused_prefix=_resolve_fused_prefix(ft_cfg.get("fused_prefix", "auto")),
        prefix_quant=bool(ft_cfg.get("fused_prefix_quant", False)),
        scan_blocks=bool(ft_cfg.get("scan_blocks", False)),
        scan_remat=bool(ft_cfg.get("scan_remat", True)),
        lora_rank=int(ft_cfg.get("lora_rank", 0)),
        lora_alpha=float(ft_cfg.get("lora_alpha", 16.0)),
        lora_mlp=bool(ft_cfg.get("lora_mlp", False)),
    )

    mesh = _build_mesh(cfg)
    checkpoint_fn = None
    if pcfg.checkpoint_interval and bool(ft_cfg.get("save_model", False)):
        def checkpoint_fn(par, opt_state, epoch):
            # async: the device->host copy happens here; the disk write
            # overlaps the following train epochs (runner waits after
            # training before touching the files)
            try:
                p = save_checkpoint(cfg, par, opt_state, epoch=epoch,
                                    async_save=True)
                print(f"[ckpt] epoch {epoch} -> {p} (async)")
            except Exception as exc:
                print(f"[ckpt] periodic save failed: {exc}")

    out = finetune(
        bundle["model"], bundle["params"], loaders.train, loaders.val,
        loaders.test, pcfg,
        text_weights=bundle["text_weights"],
        prompt_tokens=bundle["prompt_tokens"],
        unlocked_groups=int(ft_cfg.get("unlocked_groups", 1)),
        unlocked_text_layers=int(ft_cfg.get("unlocked_layers", 1)),
        seed=int(cfg.get("seed", 1)),
        l2_eval_ctx=_l2_eval_ctx(cfg, bundle["num_classes"]),
        logger=logger,
        checkpoint_fn=checkpoint_fn,
        resume_from=resume_from,
        mesh=mesh,
        fsdp=(mesh is not None
              and bool((cfg.get("parallel", {}) or {}).get("fsdp", False))),
    )

    if checkpoint_fn is not None:
        from .utils import wait_for_async_saves

        wait_for_async_saves()

    # checkpoint
    saved_path = None
    if bool(ft_cfg.get("save_model", False)):
        try:
            saved_path = save_checkpoint(cfg, out["params"], out["opt_state"],
                                         epoch=pcfg.epochs)
            print(f"[ckpt] saved -> {saved_path}")
        except Exception as exc:
            print(f"[ckpt] save failed: {exc}")
        if out.get("adapters"):
            # LoRA: the adapters alone reproduce the run from the base
            # checkpoint (merged weights are in the checkpoint above)
            try:
                adir = (Path(str(saved_path)).parent if saved_path
                        else Path(str(ft_cfg.get("save_model_dir",
                                                 "./model_ckpt"))))
                adir.mkdir(parents=True, exist_ok=True)
                apath = adir / "lora_adapters.npz"
                flat = {f"{k}/{n}": np.asarray(v)
                        for k, ab in out["adapters"].items()
                        for n, v in ab.items()}
                np.savez(apath, **flat)
                print(f"[ckpt] LoRA adapters -> {apath}")
            except Exception as exc:
                print(f"[ckpt] adapter save failed: {exc}")

    # embedding cache
    if bool(ft_cfg.get("cache_embeddings", False)):
        split = str(ft_cfg.get("cache_embeddings_split", "test")).lower()
        view = {"train": loaders.train, "val": loaders.val,
                "test": loaders.test}.get(split, loaders.test)
        if view is None or view.num_samples == 0:
            print(f"[warn] cache_embeddings requested but split '{split}' is empty.")
        else:
            cache_embeddings(cfg, bundle["model"], out["params"], view,
                             bundle["resolution"], split=split,
                             checkpoint_path=saved_path)

    if out["tracker"] is not None and logger is not None:
        out["tracker"].save_classification(logger)
    if (out["test"] is not None and out["test"].get("cm") is not None
            and logger is not None):
        logger.log_confusion_matrix(out["test"]["cm"], CS_CLASSNAMES)
    return out


def _build_mesh(cfg):
    """(data, model) mesh for the PEFT/eval paths.

    parallel.enabled: true | false | 'auto' (use a mesh when >1 device);
    parallel.model_parallel: TP degree (1 = pure DP)."""
    par = cfg.get("parallel", {}) or {}
    enabled = par.get("enabled", "auto")
    n = len(jax.devices())
    use = enabled if isinstance(enabled, bool) else n > 1
    if not use:
        return None
    from .parallel import make_mesh

    mesh = make_mesh(model_parallel=int(par.get("model_parallel", 1)))
    print(f"[parallel] mesh {dict(mesh.shape)} over {n} devices")
    return mesh


def _cache_shard_kwargs(cfg) -> Dict[str, Optional[int]]:
    """Optional multi-host cache sharding overrides (default: follow
    jax.process_index/count inside the writer)."""
    si = cfg.get("cache_shard_index", None)
    sc = cfg.get("cache_shard_count", None)
    return {"shard_index": None if si is None else int(si),
            "shard_count": None if sc is None else int(sc)}


def _cache_write_barrier() -> None:
    """Multi-host: every process writes only its own cache shard — block
    until ALL processes have finished writing before anyone reads (the
    sharded reader refuses incomplete shard sets, but the barrier avoids
    the race entirely)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("feature_cache_written")


def _refuse_poisoned_cache(bundle) -> None:
    """A failed weight load falls back to random init (zero-egress dev
    environments) — but the feature cache is keyed by the REQUESTED
    backbone name, so writing features from fallback weights would poison
    the cache for every later run with working weights.  Fail loudly."""
    if (str(bundle.get("source", "")) == "random"
            and not str(bundle.get("backbone_name", "")).startswith(
                "random:")):
        raise RuntimeError(
            f"refusing to write a feature cache for "
            f"'{bundle.get('backbone_name')}' from fallback RANDOM weights "
            "(the cache is keyed by the requested backbone; later runs "
            "with real weights would silently consume random features). "
            "Fix the weight load or use an explicit 'random:' backbone.")


def run_prolip(cfg, bundle, loaders, logger=None, config_file: str = "cfg"
               ) -> Dict[str, Any]:
    """ProLIP projector tuning on cached pre-projection features
    (reference `/root/reference/methods/ProLIP.py:50-299`)."""
    import time as _time

    from .ops.preprocess import eval_transform

    model: CLIPModel = bundle["model"]
    params = bundle["params"]
    text_weights = jnp.asarray(bundle["text_weights"], jnp.float32)
    num_classes = bundle["num_classes"]
    resolution = bundle["resolution"]
    shots = int(cfg.get("shots", 0) or 0)
    seed = int(cfg.get("seed", 1) or 1)
    aug_views = int(cfg.get("aug_views", 1) or 1)

    cache_dir = feature_cache_dir(cfg)
    if not feature_cache_exists_sharded(cache_dir, aug_views):
        if cfg.get("finetune", {}).get("require_cached_features", True):
            raise FileNotFoundError(
                f"Cached features not found in {cache_dir}; run with "
                f"save_features=True first.")
        print(f"[warn] Cached features missing in {cache_dir}; generating now.")
        _refuse_poisoned_cache(bundle)
        cache_features_from_loader(cfg, model, params, loaders.train,
                                   resolution, loaders.info,
                                   compute_dtype=compute_dtype_for_backend(),
                                   **_cache_shard_kwargs(cfg))
        _cache_write_barrier()

    views, labels = read_preprojection_cache(cache_dir, aug_views,
                                             max_label=num_classes)
    init_spec = ProjectorSpec.from_clip_params(params, model.config.is_vit)

    from .models.fast_vit import encode_image_fastest, pack_fastest

    from .ops.preprocess import normalize_stats_for

    nmean, nstd = normalize_stats_for(model.config)
    # per-family fast pack (SigLIP qkv groups / ConvNeXt banded dw / RN
    # folded BN) — params are static on this path, build once
    pack = pack_fastest(model, params, model.config,
                        compute_dtype_for_backend())

    @jax.jit
    def encode_pre(params, pk, images_u8):
        # params/pack are ARGUMENTS, not closure constants (closing over
        # a real tower embeds hundreds of MB into the compiled program —
        # see DEV_NOTES.md / make_train_step)
        x = eval_transform(images_u8, resolution,
                           dtype=compute_dtype_for_backend(),
                           mean=nmean, std=nstd)
        return encode_image_fastest(model, params, x, model.config,
                                    packed=pk)

    def encode_split(view) -> tuple:
        feats, labs = [], []
        for batch in view.batches():
            pre = np.asarray(encode_pre(params, pack,
                                        jnp.asarray(batch.images)),
                             np.float32)[batch.valid]
            feats.append(pre)
            labs.append(batch.labels[batch.valid])
        return np.concatenate(feats, 0), np.concatenate(labs, 0)

    epochs = int(cfg.get("train_epoch", 5))
    feat_bs = int(cfg.get("feat_batch_size", 0) or 0)

    if bool(cfg.get("search_lr", False)):
        val_feats, val_labels = encode_split(loaders.val)
        lr_v, lambda_v, best_acc = grid_search(
            views, labels, text_weights, init_spec, val_feats, val_labels,
            epochs, feat_batch_size=feat_bs)
        print(f"Search completed ===> lr: {lr_v}, lambda: {lambda_v} "
              f"(val acc {best_acc:.4f})")
        out_path = (Path("results_lr") / config_file /
                    f"{cfg.get('dataset', 'cs')}{shots}_shot_lr.txt")
        out_path.parent.mkdir(parents=True, exist_ok=True)
        with out_path.open("a", encoding="utf-8") as f:
            f.write(f"{lr_v}, {lambda_v}\n")
    else:
        lr_v = float(cfg.get("lr_v", 5e-5))
        lambda_v = resolve_lambda(cfg, shots)
        print(f"Search completed ===> lr: {lr_v}, lambda: {lambda_v}")

    t0 = _time.time()
    proj, stats = train_projector(views, labels, text_weights, init_spec,
                                  lr_v, lambda_v, epochs,
                                  feat_batch_size=feat_bs)
    print(f"Total time = {_time.time() - t0:.4f}")

    if bool(cfg.get("save_checkpoints", False)):
        save_path = (Path("trained_models") / config_file /
                     str(cfg.get("dataset", "cs")) / f"{shots}_shot" /
                     f"{cfg.get('dataset', 'cs')}_seed{seed}.npz")
        save_projector(save_path, proj.weight, proj.bias,
                       meta={"lr": lr_v, "lambda": lambda_v,
                             "epochs": epochs, "seed": seed})
        print(f"[ckpt] projector saved -> {save_path}")

    print("\nStart evaluation on test set")
    test_feats, test_labels = encode_split(loaders.test)
    acc_test = projector_accuracy(proj, test_feats, test_labels, text_weights)
    loss = stats.get("final_loss")

    # optional extra test sets, each bulk-loaded with its own folder/index
    # (generalizes the reference's ImageNet v2/sketch/a/r branch)
    extra_results = {}
    extra = cfg.get("extra_testsets", None) or {}
    if extra:
        from .data import SplitView, load_folders
        from .train.prolip import evaluate_multi_testsets

        extra_views = {}  # (NOT 'views' — that name holds the cached
        for name, spec in extra.items():  # feature arrays above)
            ds_extra = load_folders(
                spec["dataset_paths"], spec["index_file_names"],
                int(cfg["data"]["preprocessing"].get("resize", 256)),
                # decode settings must match the main loaders, or the
                # extra-testset pixels silently differ from the test set
                channel_order=str(cfg["data"].get("channel_order", "rgb")),
                prescale=bool(cfg["data"].get("decode_prescale", True)))
            extra_views[name] = SplitView(ds_extra, np.arange(len(ds_extra)),
                                          int(cfg["data"]["batch_size"]))
        extra_results = evaluate_multi_testsets(
            proj, encode_split, extra_views, {}, text_weights)
        for name, acc in extra_results.items():
            print(f"[extra testset {name}] acc={acc:.4f}")

    if logger is not None:
        logger.log({"acc": acc_test, **{f"acc_{k}": v
                                        for k, v in extra_results.items()}})
    return {"loss": loss, "acc": acc_test, "lr": lr_v, "lambda": lambda_v,
            "projector": proj, "stats": stats, "extra": extra_results}


def run(cfg, inspect_only: bool = False, config_file: str = "cfg",
        logger_mode: str = "auto",
        run_name: Optional[str] = None) -> Dict[str, Any]:
    """Full pipeline entry (used by main.py and the sweep launcher)."""
    from .utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    set_seed(int(cfg.get("seed", 1)))
    backend = str(cfg.get("clip_backend", "openai")).lower()

    logger = None
    use_logging = (cfg.get("finetune", {}).get("enabled", False)
                   and cfg.get("wandb_project", None))
    if use_logging:
        if run_name is None:
            run_name = (f"{cfg.get('dataset', 'ds')}_"
                        f"shots{cfg.get('shots', 0)}_"
                        f"seed{cfg.get('seed', 1)}_"
                        f"{cfg.get('backbone', 'clip')}_"
                        f"{cfg.get('train_epoch', 0)}eps_proj")
        logger = RunLogger(cfg.get("wandb_project"), run_name, config=cfg,
                           mode=logger_mode)

    bundle = init_clip_and_text_head(cfg)
    loaders = build_loaders(cfg)
    inspect(cfg, bundle, loaders)

    result: Dict[str, Any] = {"bundle": bundle, "loaders": loaders}
    if inspect_only:
        print("\nInspection-only run; skipping caching and training.")
        if logger:
            logger.finish()
        return result

    if bool(cfg.get("save_features", False)):
        _refuse_poisoned_cache(bundle)
        cache_features_from_loader(
            cfg, bundle["model"], bundle["params"], loaders.train,
            bundle["resolution"], loaders.info,
            compute_dtype=compute_dtype_for_backend(),
            **_cache_shard_kwargs(cfg))
        _cache_write_barrier()

    do_finetune = cfg.get("finetune", {}).get("enabled", False)
    if do_finetune and backend == "openclip":
        out = run_peft(cfg, bundle, loaders, logger, config_file)
        result["peft"] = out
        if out["test"] is not None:
            t = out["test"]
            print("\n==== OpenCLIP Finetune results ====")
            print(f"Loss: {t['loss']}, Top-1 Accuracy: {t['top1']}, "
                  f"Top-3 Accuracy: {t['top3']}, F1 (weighted): {t['f1']}, "
                  f"MCC: {t['mcc']}")
            if logger is not None:
                logger.log({"top1_acc": t["top1"], "top3_acc": t["top3"],
                            "f1": t["f1"], "mcc": t["mcc"], "loss": t["loss"]})
    elif do_finetune and backend == "openai":
        out = run_prolip(cfg, bundle, loaders, logger, config_file)
        result["prolip"] = out
        print("\n==== ProLIP results ====")
        print(f"Loss: {out['loss']}, Accuracy: {out['acc']}")
    else:
        print("\nFinetune disabled (finetune.enabled=False).")
        # reference config stub made real: cache embeddings from a saved
        # checkpoint without training (finetune.cache_embeddings_checkpoint)
        ft_cfg = cfg.get("finetune", {})
        ckpt = ft_cfg.get("cache_embeddings_checkpoint", None)
        if bool(ft_cfg.get("cache_embeddings", False)) and ckpt:
            from .utils import load_checkpoint

            restored = load_checkpoint(Path(ckpt), bundle["params"])
            split = str(ft_cfg.get("cache_embeddings_split", "test")).lower()
            view = {"train": loaders.train, "val": loaders.val,
                    "test": loaders.test}.get(split, loaders.test)
            cache_embeddings(cfg, bundle["model"], restored["params"], view,
                             bundle["resolution"], split=split,
                             checkpoint_path=str(ckpt))

    if logger is not None:
        logger.finish()
    return result
