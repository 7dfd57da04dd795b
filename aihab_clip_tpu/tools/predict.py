#!/usr/bin/env python
"""Batch inference CLI: classify a folder of habitat photos -> CSV.

Production-serving utility (no counterpart in the reference, which only
evaluates labeled datasets): loads a model (zoo name, checkpoint path, or
random for smoke), builds the CS prompt-ensemble text head, streams the
folder through the jitted device pipeline in fixed-size padded batches,
and writes per-image top-k predictions with probabilities.

Model/classifier construction is shared with the persistent server
(`aihab_clip_tpu.serving.ClassifierEngine`); this CLI adds the folder
walk, lag-1 decode/compute pipelining, and the CSV contract.

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

    import pandas as pd

    from ..serving import ClassifierEngine

    try:
        engine = ClassifierEngine(
            model=args.model, batch_size=args.batch_size,
            resolution=args.resolution, flat=args.flat, lora=args.lora,
            lora_alpha=args.lora_alpha, quantize=args.quantize)
    except ValueError as e:
        raise SystemExit(str(e))

    folder = Path(args.images)
    files = sorted(f for f in os.listdir(folder)
                   if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    if not files:
        raise SystemExit(f"no images found in {folder}")
    print(f"[predict] {len(files)} images, model {args.model} "
          f"({engine.bundle.source}), resolution {engine.resolution}")

    bs = args.batch_size
    rows = []
    t0 = time.perf_counter()

    def emit(kept, probs_dev):
        probs = np.asarray(probs_dev)[:len(kept)]
        tk = engine.topk(probs, args.topk)
        for i, f in enumerate(kept):
            row = {"file_name": f,
                   "predicted_label": tk[i][0]["label"],
                   "predicted_word_label": tk[i][0]["name"]}
            for j, rec in enumerate(tk[i]):
                row[f"top{j + 1}_label"] = rec["label"]
                row[f"top{j + 1}_name"] = rec["name"]
                row[f"top{j + 1}_prob"] = rec["prob"]
            rows.append(row)

    pending = None  # lag-1 fetch: decode batch i+1 while the device
    # classifies batch i
    for start in range(0, len(files), bs):
        chunk = files[start:start + bs]
        imgs = []
        kept = []
        for f in chunk:
            arr = engine.decode_file(str(folder / f))
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
        probs_dev = engine.classify_dispatch(batch)
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
