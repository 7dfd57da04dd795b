#!/usr/bin/env python
"""End-to-end zero-shot parity harness vs the reference implementation.

Loads the reference torch CLIP (dynamically, as a test oracle), converts
its weights into our Flax model, runs BOTH full pipelines — reference:
PIL resize/center-crop + torch encode; ours: device eval transform + jit
encode — over the same images with the same prompt ensemble, and reports
logit agreement and top-1 match rate.

Works offline with a random-weight model (pipeline parity) and with real
zoo checkpoints when available (accuracy parity, the 0.1% north-star).

Usage:
    python -m aihab_clip_tpu.tools.parity_check \
        [--backbone ViT-B/32 | --random] [--data_dir <cs-format folder>] \
        [--index index.csv] [--resolution 224] [--limit 64]
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
from pathlib import Path

import numpy as np

REF_MODEL_PATH = Path("/root/reference/clip/model.py")


def _load_ref_module():
    spec = importlib.util.spec_from_file_location("ref_clip_model",
                                                  REF_MODEL_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# reference-architecture hyperparameters for full-size random-weight parity
# runs (matches /root/reference/clip/model.py:396-419 shape inference)
RANDOM_ARCHS = {
    "tiny": dict(embed_dim=64, vision_layers=2, vision_width=128,
                 text_width=128, text_heads=2, text_layers=2),
    "ViT-B/32": dict(embed_dim=512, vision_layers=12, vision_width=768,
                     vision_patch_size=32, text_width=512, text_heads=8,
                     text_layers=12),
    "ViT-B/16": dict(embed_dim=512, vision_layers=12, vision_width=768,
                     vision_patch_size=16, text_width=512, text_heads=8,
                     text_layers=12),
}


def build_models(backbone: str, use_random: bool, resolution: int,
                 random_arch: str = "tiny", weights: str | None = None):
    """Returns (torch_model, flax_model, flax_params, config)."""
    import torch

    from ..models import CLIPModel, load, torch_state_dict_to_params

    ref = _load_ref_module()
    if weights is not None:
        # --weights <local.pt>: the one-command real-weight calibration
        # path (usable the moment a checkpoint lands in a zero-egress
        # env).  Accepts a JIT archive or a plain torch state dict.
        try:
            t_model = torch.jit.load(weights, map_location="cpu")
            state = t_model.state_dict()
        except RuntimeError:
            obj = torch.load(weights, map_location="cpu",
                             weights_only=False)
            state = obj.state_dict() if hasattr(obj, "state_dict") else obj
            state = state.get("state_dict", state)
        for k in ("input_resolution", "context_length", "vocab_size"):
            state.pop(k, None)
        state = {k: v.float() for k, v in state.items()}
        t_model = ref.build_model(dict(state)).float().eval()
        cfg, params = torch_state_dict_to_params(t_model.state_dict())
        return t_model, CLIPModel(cfg), params, cfg
    if use_random:
        torch.manual_seed(0)
        a = RANDOM_ARCHS[random_arch]
        t_model = ref.CLIP(
            a["embed_dim"], resolution, a["vision_layers"],
            a["vision_width"],
            a.get("vision_patch_size", max(resolution // 8, 8)),
            77, 49408, a["text_width"], a["text_heads"],
            a["text_layers"]).eval()
    else:
        bundle = load(backbone)  # ensures a cached conversion exists
        # rebuild the torch model from the same checkpoint for the oracle
        import torch as _t

        from ..models.zoo import _convert_torch_checkpoint, default_cache_root

        ckpt = None
        for cand in (default_cache_root() / "checkpoints").glob("*.pt"):
            if backbone.replace("/", "-") in cand.name:
                ckpt = cand
                break
        if ckpt is None:
            raise FileNotFoundError(
                f"No local torch checkpoint for {backbone}; use --random")
        try:
            t_model = _t.jit.load(str(ckpt), map_location="cpu")
            state = t_model.state_dict()
        except RuntimeError:
            state = _t.load(str(ckpt), map_location="cpu")
        for k in ("input_resolution", "context_length", "vocab_size"):
            state.pop(k, None)
        t_model = ref.build_model({k: v.float() for k, v in state.items()}).float()

    cfg, params = torch_state_dict_to_params(t_model.state_dict())
    j_model = CLIPModel(cfg)
    return t_model, j_model, params, cfg


def reference_preprocess(images_u8: np.ndarray, resolution: int) -> np.ndarray:
    """PIL BICUBIC shorter-side resize + center crop + CLIP normalize
    (the reference test transform, `/root/reference/clip/clip.py:74-81`)."""
    from PIL import Image

    from ..ops.preprocess import CLIP_MEAN, CLIP_STD

    out = []
    for img in images_u8:
        pil = Image.fromarray(img)
        w, h = pil.size
        scale = resolution / min(w, h)
        pil = pil.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
        w2, h2 = pil.size
        left = (w2 - resolution) // 2
        top = (h2 - resolution) // 2
        pil = pil.crop((left, top, left + resolution, top + resolution))
        arr = np.asarray(pil).astype(np.float32) / 255.0
        arr = (arr - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
        out.append(arr)
    return np.stack(out).astype(np.float32)


def run_parity(backbone: str = "ViT-B/32", use_random: bool = True,
               data_dir: str | None = None, index_name: str = "index.csv",
               resolution: int = 224, limit: int = 64,
               verbose: bool = True, random_arch: str = "tiny",
               weights: str | None = None, check_int8: bool = False,
               parity_md: str | None = None) -> dict:
    import torch

    import jax
    import jax.numpy as jnp

    from ..data import load_folders, make_synthetic_cs_dataset
    from ..models import CLIPModel, build_text_head
    from ..ops.preprocess import eval_transform
    from ..templates import gen_prompts
    from ..tokenizer import tokenize

    t_model, j_model, params, cfg = build_models(backbone, use_random,
                                                 resolution, random_arch,
                                                 weights)
    if weights is not None:
        resolution = cfg.image_resolution

    # data
    if data_dir is None:
        import tempfile

        tmp = tempfile.mkdtemp()
        synth = make_synthetic_cs_dataset(tmp, n_train_per_class=0 or 3,
                                          n_test_per_class=3,
                                          image_size=max(resolution, 64))
        data_dir = synth["test_dir"]
        index_name = synth["index_file_name"]
    ds = load_folders([data_dir], [index_name],
                      resize_dim=max(resolution + resolution // 2, 96))
    images = np.asarray(ds.images[:limit])
    labels = ds.labels[:limit]

    # text head (identical prompts/tokens both sides)
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    tokens = tokenize(prompts, context_length=cfg.context_length,
                      truncate=True)

    with torch.no_grad():
        _, t_txt = t_model.encode_text(torch.from_numpy(tokens.astype(np.int64)))
        t_txt = t_txt.float()
        t_txt = t_txt / t_txt.norm(dim=-1, keepdim=True)
        t_w = t_txt.reshape(20, tpc, -1).mean(1)
        t_w = (t_w / t_w.norm(dim=-1, keepdim=True)).t()

    head = build_text_head(j_model, params, prompts, 20, tpc,
                           context_length=cfg.context_length)
    j_w = np.asarray(head["text_weights"])
    txt_diff = np.abs(j_w - t_w.numpy()).max()

    # reference image path
    t_in = reference_preprocess(images, resolution)
    with torch.no_grad():
        t_feats = t_model.encode_image(
            torch.from_numpy(np.transpose(t_in, (0, 3, 1, 2)))).float()
        # reference zero-shot uses projected features; project via visual.proj
        if hasattr(t_model.visual, "proj"):
            t_feats = t_feats @ t_model.visual.proj.float()
        t_feats = t_feats / t_feats.norm(dim=-1, keepdim=True)
        t_logits = (100.0 * t_feats @ t_w).numpy()

    # our image path (device)
    @jax.jit
    def encode(p, im):
        x = eval_transform(im, resolution)
        _, post = j_model.apply({"params": p}, x,
                                method=CLIPModel.encode_image, project=True)
        post = post / jnp.maximum(
            jnp.linalg.norm(post, axis=-1, keepdims=True), 1e-12)
        return 100.0 * post @ jnp.asarray(j_w)

    j_logits = np.asarray(encode(params, jnp.asarray(images)))

    t_pred = t_logits.argmax(-1)
    j_pred = j_logits.argmax(-1)
    agree = float((t_pred == j_pred).mean())
    t_acc = float((t_pred == labels).mean())
    j_acc = float((j_pred == labels).mean())
    logit_mae = float(np.abs(t_logits - j_logits).mean())

    report = {
        "n_images": len(images),
        "text_weights_max_abs_diff": float(txt_diff),
        "logit_mean_abs_diff": logit_mae,
        "top1_prediction_agreement": agree,
        "reference_top1_acc": t_acc,
        "ours_top1_acc": j_acc,
        "top1_acc_gap": abs(t_acc - j_acc),
    }
    if check_int8 and not isinstance(cfg.vision_layers, tuple):
        # int8 serving-path accuracy delta vs our f32 pipeline (ViT only)
        from ..models.quant_vit import quantize_vit_params, vit_encode_int8

        qparams = quantize_vit_params(params, cfg)

        @jax.jit
        def encode_q(im):
            x = eval_transform(im, resolution)
            _, post = vit_encode_int8(qparams, x, cfg, project=True,
                                      dtype=jnp.float32)
            post = post / jnp.maximum(
                jnp.linalg.norm(post, axis=-1, keepdims=True), 1e-12)
            return 100.0 * post @ jnp.asarray(j_w)

        q_logits = np.asarray(encode_q(jnp.asarray(images)))
        q_pred = q_logits.argmax(-1)
        report["int8_top1_agreement_vs_f32"] = float((q_pred == j_pred).mean())
        report["int8_top1_acc"] = float((q_pred == labels).mean())
        report["int8_logit_mean_abs_diff_vs_f32"] = float(
            np.abs(q_logits - j_logits).mean())

        if jax.devices()[0].platform == "tpu":
            from ..models.fast_vit import vit_encode_block_fused

            @jax.jit
            def encode_fused(p, im):
                x = eval_transform(im, resolution, dtype=jnp.bfloat16)
                _, post = vit_encode_block_fused(p, x, cfg, project=True)
                post = post.astype(jnp.float32)
                post = post / jnp.maximum(
                    jnp.linalg.norm(post, axis=-1, keepdims=True), 1e-12)
                return 100.0 * post @ jnp.asarray(j_w)

            f_logits = np.asarray(encode_fused(params, jnp.asarray(images)))
            f_pred = f_logits.argmax(-1)
            report["fused_top1_agreement_vs_f32"] = float(
                (f_pred == j_pred).mean())
            report["fused_top1_acc"] = float((f_pred == labels).mean())
        else:
            report["fused_path"] = "skipped (TPU-only Pallas dispatch)"

    report["gate_pass"] = gate_reference_grade(report)
    if parity_md:
        _append_parity_section(parity_md, backbone, weights, report)
    if verbose:
        print("\n==== Zero-shot pipeline parity ====")
        for k, v in report.items():
            print(f"{k}: {v}")
        print("reference-grade gate:",
              "PASS" if report["gate_pass"] else "FAIL",
              f"(agreement >= {GATE_MIN_AGREEMENT}, "
              f"logit MAE <= {GATE_MAX_LOGIT_MAE}, "
              f"text max-diff <= {GATE_MAX_TEXT_DIFF})")
    return report


# Reference-grade parity gate.  With identical converted weights and an
# eval transform PIL-parity-tested to ~0.008 pixel levels
# (PERF_NOTES.md), measured full-size deltas are logit MAE ~0.0015
# (ViT-B/32 @224) / ~0.0025 (tiny @64) with 100% top-1 agreement — the
# thresholds below are ~10x margin over measurement, and tight enough
# that a fraction-of-a-percent accuracy regression fails the gate
# (replaces the r1 gate of MAE<0.5 / agreement>0.9; VERDICT.md r1 #2).
GATE_MIN_AGREEMENT = 0.99
GATE_MAX_LOGIT_MAE = 0.02
GATE_MAX_TEXT_DIFF = 1e-4
GATE_MAX_ACC_GAP = 0.01


def gate_reference_grade(report: dict) -> bool:
    return (report["top1_prediction_agreement"] >= GATE_MIN_AGREEMENT
            and report["logit_mean_abs_diff"] <= GATE_MAX_LOGIT_MAE
            and report["text_weights_max_abs_diff"] <= GATE_MAX_TEXT_DIFF
            and report["top1_acc_gap"] <= GATE_MAX_ACC_GAP)


def _append_parity_section(path: str, backbone: str, weights: str | None,
                           report: dict) -> None:
    """Append a markdown PARITY section recording this calibration run."""
    import datetime

    lines = [
        "",
        f"## Calibration run — {backbone}"
        + (f" (weights: {weights})" if weights else " (random weights)"),
        "",
        f"Recorded {datetime.date.today().isoformat()} by "
        "`tools/parity_check.py`:",
        "",
    ]
    lines += [f"- `{k}`: {v}" for k, v in report.items()]
    with open(path, "a") as f:
        f.write("\n".join(lines) + "\n")


def main():
    from ..utils import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--backbone", default="ViT-B/32")
    p.add_argument("--random", action="store_true",
                   help="random-weight pipeline parity (offline)")
    p.add_argument("--random_arch", default="tiny",
                   choices=sorted(RANDOM_ARCHS),
                   help="architecture for --random (full-size archs give "
                        "reference-grade parity evidence)")
    p.add_argument("--data_dir", default=None)
    p.add_argument("--index", default="index.csv")
    p.add_argument("--resolution", type=int, default=224)
    p.add_argument("--limit", type=int, default=64)
    p.add_argument("--weights", default=None,
                   help="local torch checkpoint (.pt): one-command "
                        "real-weight calibration — convert, golden logits "
                        "vs torch, zero-shot both stacks, int8/fused "
                        "accuracy deltas")
    p.add_argument("--check_int8", action="store_true",
                   help="also measure int8 (and, on TPU, fused-path) "
                        "accuracy deltas vs our f32 pipeline")
    p.add_argument("--parity_md", default=None,
                   help="append the report as a markdown section to this "
                        "file (e.g. PARITY.md)")
    p.add_argument("--train", action="store_true",
                   help="also run TRAINING parity: fixed-seed ProLIP "
                        "(cache -> 7x7 search -> train -> test acc) and a "
                        "short PEFT run, the reference's own code as a "
                        "torch oracle (tools/train_parity.py)")
    args = p.parse_args()
    if not REF_MODEL_PATH.is_file():
        sys.exit("reference implementation not available")
    report = run_parity(args.backbone, args.random, args.data_dir,
                        args.index, args.resolution, args.limit,
                        random_arch=args.random_arch, weights=args.weights,
                        check_int8=args.check_int8 or bool(args.weights),
                        parity_md=args.parity_md)
    ok = report["gate_pass"]
    if args.train:
        from .train_parity import run_train_parity

        train_report = run_train_parity(
            args.backbone, args.random or args.weights is None,
            args.random_arch, weights=args.weights,
            resolution=args.resolution, parity_md=args.parity_md)
        ok = ok and train_report["gate_pass"]
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
