#!/usr/bin/env python
"""Persistent prediction server CLI.

Serving counterpart of the batch `tools/predict` CLI (the reference has
neither — its only inference surface is the evaluation loop in
`/root/reference/methods/PEFT_openclip.py:50-136`).  Loads the model
once, compiles one fixed-shape classify program, then serves forever:

    python -m aihab_clip_tpu.tools.serve --model ViT-B/16 --port 8000 \
        [--quantize int8] [--batch_size 64] [--max_wait_ms 5] [--flat] \
        [--lora adapters.npz]

API:
    POST /predict     raw image bytes, or {"images_b64": [...]} JSON
    GET  /healthz     readiness + model info
    GET  /stats       request/image/batch counters, fill ratio, latency

Example request:
    curl -s -X POST --data-binary @photo.jpg \
        -H 'Content-Type: image/jpeg' http://localhost:8000/predict
"""

from __future__ import annotations

import argparse


def build_server(argv=None):
    from ..serving import ClassifierEngine, PredictServer
    from ..utils import honor_jax_platforms_env

    honor_jax_platforms_env()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="ViT-B/16",
                   help="zoo name | checkpoint path | random:<ARCH>")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000,
                   help="0 = ephemeral (printed at startup)")
    p.add_argument("--batch_size", type=int, default=64,
                   help="largest device batch (bucket shapes compile at "
                        "batch_size, /2, /4 — see --buckets)")
    p.add_argument("--buckets", type=int, default=3,
                   help="number of compiled batch-shape buckets "
                        "(batch_size >> i); 1 = single shape (r2 behavior)")
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="max time to hold a non-full batch for stragglers")
    p.add_argument("--topk", type=int, default=3)
    p.add_argument("--flat", action="store_true",
                   help="flat prompts (default: hierarchical descriptive)")
    p.add_argument("--lora", default=None, metavar="ADAPTERS_NPZ")
    p.add_argument("--lora_alpha", type=float, default=16.0)
    p.add_argument("--quantize", default="none", choices=["none", "int8"])
    p.add_argument("--request_timeout", type=float, default=60.0)
    args = p.parse_args(argv)

    # persistent XLA compile cache: server restarts skip the minutes-long
    # warmup compile (same policy as the runner; AIHAB_NO_COMPILE_CACHE=1
    # disables — utils/profiling.enable_compilation_cache logs the state)
    from ..utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    engine = ClassifierEngine(
        model=args.model, batch_size=args.batch_size, flat=args.flat,
        lora=args.lora, lora_alpha=args.lora_alpha, quantize=args.quantize,
        buckets=args.buckets)
    return PredictServer(
        engine, host=args.host, port=args.port,
        max_wait_ms=args.max_wait_ms, topk=args.topk,
        request_timeout=args.request_timeout)


def main(argv=None):
    server = build_server(argv)
    try:
        server.serve()
    except KeyboardInterrupt:
        print("\n[serving] shutting down")
        server.stop()


if __name__ == "__main__":
    main()
