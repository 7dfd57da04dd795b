#!/usr/bin/env python
"""Batch inference CLI: classify a folder of habitat photos -> CSV.

Production-serving utility (no counterpart in the reference, which only
evaluates labeled datasets): loads a model (zoo name, checkpoint path, or
random for smoke), builds the CS prompt-ensemble text head, streams the
folder through the jitted device pipeline in fixed-size padded batches,
and writes per-image top-k predictions with probabilities.

Usage:
    python -m aihab_clip_tpu.tools.predict --images <folder> \
        [--model ViT-B/16] [--out predictions.csv] [--batch_size 64] \
        [--topk 3] [--hierarchical/--flat] [--resolution 224]
"""

from __future__ import annotations

import argparse
import os
import time
from pathlib import Path

import numpy as np

from ..backend import dispatch_backend


def main(argv=None):
    from ..utils import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", required=True, help="folder of images")
    p.add_argument("--model", default="ViT-B/16",
                   help="zoo name | checkpoint path | random:<ARCH>")
    p.add_argument("--out", default="predictions.csv")
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--topk", type=int, default=3)
    p.add_argument("--resolution", type=int, default=0,
                   help="0 = model native")
    p.add_argument("--flat", action="store_true",
                   help="flat prompts (default: hierarchical descriptive)")
    p.add_argument("--lora", default=None, metavar="ADAPTERS_NPZ",
                   help="merge LoRA adapters (lora_adapters.npz from a "
                        "finetune.lora_rank run) into the model weights")
    p.add_argument("--lora_alpha", type=float, default=16.0,
                   help="LoRA scale used at training time")
    p.add_argument("--quantize", default="none", choices=["none", "int8"],
                   help="int8 = W8A8 dynamic-quantized ViT tower "
                        "(~1.x encode speedup on TPU, see PERF_NOTES.md)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import pandas as pd

    from ..data.bulk_load import _decode_resize
    from ..models import CLIPModel, build_text_head, load
    from ..ops.preprocess import eval_transform
    from ..taxonomy import CS_CLASSNAMES, REASSIGN_LABEL_NAME_L3
    from ..templates import gen_prompts

    # bf16 compute on TPU (the benchmarked fast-tower configuration);
    # f32 would double VMEM residency and halve the MXU rate
    compute_dtype = (jnp.bfloat16 if dispatch_backend() == "tpu"
                     else jnp.float32)
    bundle = load(args.model, dtype=compute_dtype)
    model, params = bundle.model, bundle.params
    if args.lora:
        from ..train.lora import lora_merge

        blob = np.load(args.lora)
        adapters: dict = {}
        for name in blob.files:  # "<target path>/a" | "<target path>/b"
            path, leaf = name.rsplit("/", 1)
            adapters.setdefault(path, {})[leaf] = jnp.asarray(blob[name])
        params = lora_merge(params, adapters, alpha=args.lora_alpha)
        print(f"[predict] merged {len(adapters)} LoRA adapters "
              f"(alpha={args.lora_alpha}) from {args.lora}")
    res = args.resolution or bundle.config.image_resolution
    if res != bundle.config.image_resolution:
        raise SystemExit(
            f"--resolution {res} does not match the model's positional "
            f"embedding (trained at {bundle.config.image_resolution}px); "
            "omit --resolution to use the model's native size")

    prompts, tpc = gen_prompts(use_hierarchy=not args.flat,
                               use_descriptive=not args.flat)
    # tokenize_fn: SigLIP bundles carry a sentencepiece tokenizer — the
    # CLIP-BPE fallback would feed out-of-vocab ids to the text tower
    head = build_text_head(model, params, prompts, len(CS_CLASSNAMES), tpc,
                           context_length=bundle.config.context_length,
                           tokenize_fn=getattr(bundle, "tokenize_fn", None))
    tw = jnp.asarray(head["text_weights"])

    folder = Path(args.images)
    files = sorted(f for f in os.listdir(folder)
                   if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    if not files:
        raise SystemExit(f"no images found in {folder}")
    print(f"[predict] {len(files)} images, model {args.model} "
          f"({bundle.source}), resolution {res}")

    if args.quantize == "int8":
        from ..models.siglip import SigLIPConfig

        if isinstance(bundle.config, SigLIPConfig):
            from ..models.quant_siglip import (
                quantize_siglip_params,
                siglip_encode_int8,
            )

            weights = (quantize_siglip_params(params, bundle.config), params)

            def encode(p, x):
                return siglip_encode_int8(p[0], p[1], x, bundle.config,
                                          project=True)[1]
        elif bundle.config.is_vit:
            from ..models.quant_vit import (
                quantize_vit_params,
                vit_encode_int8,
            )

            weights = quantize_vit_params(params, bundle.config)

            def encode(p, x):
                return vit_encode_int8(p, x, bundle.config, project=True)[1]
        else:
            raise SystemExit("--quantize int8 requires a ViT/SigLIP backbone")
    else:
        from ..models.fast_vit import encode_image_fastest
        from ..models.siglip import SigLIPConfig

        if (isinstance(bundle.config, SigLIPConfig)
                and dispatch_backend() == "tpu"):
            # pack the q/k/v head groups once at load time and pass them
            # through the jit ARGUMENT (repacking inside the jitted
            # encode costs ~0.3% per call; closing over them would embed
            # the arrays as compile-time constants)
            from ..models.fast_siglip import pack_siglip_fast_params

            weights = (params, pack_siglip_fast_params(
                params, bundle.config, compute_dtype))

            def encode(w, x):
                return encode_image_fastest(model, w[0], x, bundle.config,
                                            project=True, packed=w[1])[1]
        else:
            weights = params

            def encode(p, x):
                return encode_image_fastest(model, p, x, bundle.config,
                                            project=True)[1]

    from ..ops.preprocess import normalize_stats_for

    nmean, nstd = normalize_stats_for(bundle.config)

    @jax.jit
    def classify(p, images_u8):
        x = eval_transform(images_u8, res, dtype=compute_dtype,
                           mean=nmean, std=nstd)
        feats = encode(p, x).astype(jnp.float32)
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        logits = 100.0 * feats @ tw
        return jax.nn.softmax(logits, axis=-1)

    decode_dim = max(res, 224)
    bs = args.batch_size
    rows = []
    t0 = time.perf_counter()

    def emit(kept, probs_dev):
        probs = np.asarray(probs_dev)[:len(kept)]
        top = np.argsort(-probs, axis=-1)[:, :args.topk]
        for i, f in enumerate(kept):
            row = {"file_name": f,
                   "predicted_label": int(top[i, 0]),
                   "predicted_word_label":
                       REASSIGN_LABEL_NAME_L3[int(top[i, 0])]}
            for j in range(args.topk):
                row[f"top{j + 1}_label"] = int(top[i, j])
                row[f"top{j + 1}_name"] = REASSIGN_LABEL_NAME_L3[int(top[i, j])]
                row[f"top{j + 1}_prob"] = float(probs[i, top[i, j]])
            rows.append(row)

    pending = None  # lag-1 fetch: decode batch i+1 while the device
    # classifies batch i
    for start in range(0, len(files), bs):
        chunk = files[start:start + bs]
        imgs = []
        kept = []
        for f in chunk:
            arr = _decode_resize(str(folder / f), decode_dim, "rgb")
            if arr is not None:
                imgs.append(arr)
                kept.append(f)
        if not imgs:
            continue
        batch = np.stack(imgs)
        if len(batch) < bs:  # pad to the static shape
            batch = np.concatenate(
                [batch, np.zeros((bs - len(batch),) + batch.shape[1:],
                                 np.uint8)])
        probs_dev = classify(weights, jnp.asarray(batch))
        if pending is not None:
            emit(*pending)
        pending = (kept, probs_dev)
    if pending is not None:
        emit(*pending)
    dt = time.perf_counter() - t0

    df = pd.DataFrame(rows)
    df.to_csv(args.out, index=False)
    print(f"[predict] {len(rows)} predictions in {dt:.1f}s "
          f"({len(rows) / max(dt, 1e-9):.1f} img/s incl. decode) -> {args.out}")
    return df


if __name__ == "__main__":
    main()
