#!/usr/bin/env python
"""Load-test the persistent prediction server on real hardware.

Measures served images/s and request latency through the FULL stack:
HTTP -> host JPEG decode -> dynamic batcher -> device classify -> topk.
The server runs in-process (serve_background) so the measurement includes
real GIL/thread interactions on the serving host; clients post JSON
batches of pre-encoded JPEGs from a thread pool.

On the 1-vCPU axon host the expected bottleneck is host JPEG decode
(~400 img/s/core at 439px), NOT the device (ViT-B encodes at ~4.3k
img/s) — the point of the measurement is the attainable throughput of
the whole serving stack and the batcher's fill ratio under load.

Usage:
    python tools_dev/bench_serve.py --model random:ViT-B/16 \
        --batch_size 64 --clients 8 --images 1024 --request_images 16
"""

from __future__ import annotations

import argparse
import base64
import http.client
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def make_jpegs(n: int, size: int, seed: int = 0):
    """Photo-like synthetic JPEGs (smooth gradients + texture), ~size px."""
    import cv2

    rng = np.random.default_rng(seed)
    blobs = []
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    for i in range(n):
        base = np.stack([
            120 + 90 * np.sin(3 * xx + i), 100 + 80 * yy,
            90 + 70 * np.cos(2 * yy + 0.5 * i)], -1)
        img = np.clip(base + rng.normal(0, 12, base.shape), 0,
                      255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", img,
                               [int(cv2.IMWRITE_JPEG_QUALITY), 90])
        assert ok
        blobs.append(base64.b64encode(buf.tobytes()).decode())
    kb = sum(len(b) for b in blobs) * 3 / 4 / 1024 / n
    print(f"[bench_serve] {n} synthetic JPEGs @ {size}px, {kb:.0f} KiB avg",
          file=sys.stderr)
    return blobs


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="random:ViT-B/16")
    p.add_argument("--quantize", default="none", choices=["none", "int8"])
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--buckets", type=int, default=3,
                   help="compiled batch-shape buckets (1 = r2 single shape)")
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--images", type=int, default=1024)
    p.add_argument("--request_images", type=int, default=16,
                   help="images per JSON request")
    p.add_argument("--request_mix", default="",
                   help="comma list of request sizes to cycle (mixed-size "
                        "workload, e.g. '32,4,16,8'); overrides "
                        "--request_images")
    p.add_argument("--source_px", type=int, default=439,
                   help="synthetic source size (CS camera fixture = 439)")
    p.add_argument("--distinct", type=int, default=64,
                   help="distinct JPEGs to cycle through")
    p.add_argument("--decode", default="auto",
                   choices=["auto", "native", "cv2"],
                   help="host decode path: auto = size-routed dispatch "
                        "(the production default), native/cv2 force one "
                        "path for A/B")
    p.add_argument("--wire", default="json", choices=["json", "binary"],
                   help="request encoding: json = base64 in JSON; binary "
                        "= length-prefixed application/x-aihab-batch")
    args = p.parse_args()

    if args.decode != "auto":
        import os

        os.environ["AIHAB_SERVE_DECODE"] = args.decode

    from aihab_clip_tpu.serving import ClassifierEngine, PredictServer
    from aihab_clip_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()  # warm-cache restarts; logs state to stderr
    blobs = make_jpegs(args.distinct, args.source_px)

    engine = ClassifierEngine(model=args.model, batch_size=args.batch_size,
                              buckets=args.buckets,
                              quantize=args.quantize, flat=True)
    srv = PredictServer(engine, port=0, max_wait_ms=args.max_wait_ms,
                        verbose=False)
    srv.serve_background()
    port = srv.server_port
    print(f"[bench_serve] server warm on :{port}", file=sys.stderr)

    if args.request_mix:
        mix = [int(v) for v in args.request_mix.split(",")]
        sizes = []
        left = args.images
        k = 0
        while left > 0:
            s = min(mix[k % len(mix)], left)
            sizes.append(s)
            left -= s
            k += 1
    else:
        sizes = [args.request_images] * (args.images // args.request_images)
    payloads = []
    pos = 0
    if args.wire == "binary":
        from aihab_clip_tpu.serving import encode_binary_batch

        raw = [base64.b64decode(b) for b in blobs]
        for s in sizes:
            sel = [raw[(pos + i) % len(raw)] for i in range(s)]
            pos += s
            payloads.append(encode_binary_batch(sel))
        content_type = "application/x-aihab-batch"
    else:
        for s in sizes:
            sel = [blobs[(pos + i) % len(blobs)] for i in range(s)]
            pos += s
            payloads.append(json.dumps({"images_b64": sel}))
        content_type = "application/json"

    lat = []

    def fire(body):
        t0 = time.perf_counter()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/predict", body=body,
                     headers={"Content-Type": content_type})
        r = conn.getresponse()
        out = json.loads(r.read())
        conn.close()
        assert r.status == 200, out
        lat.append(time.perf_counter() - t0)
        return len(out["predictions"])

    # warm the client path + fill the latency pipeline
    fire(payloads[0])

    t0 = time.perf_counter()
    with ThreadPoolExecutor(args.clients) as pool:
        total = sum(pool.map(fire, payloads))
    dt = time.perf_counter() - t0

    stats = srv.stats.snapshot(args.batch_size)
    lat_s = sorted(lat[1:]) or lat
    result = {
        "model": args.model,
        "decode": args.decode,
        "wire": args.wire,
        "quantize": args.quantize,
        "batch_size": args.batch_size,
        "clients": args.clients,
        # keep request_images an int (None when a mix drives the sizes)
        # and emit the mix under its own key — downstream scripts parse
        # request_images numerically (ADVICE r4)
        "request_images": None if args.request_mix else args.request_images,
        "request_mix": args.request_mix or None,
        "buckets": args.buckets,
        "source_px": args.source_px,
        "images": total,
        "wall_s": round(dt, 2),
        "img_per_s": round(total / dt, 1),
        "req_p50_ms": round(1e3 * lat_s[len(lat_s) // 2], 1),
        "req_p99_ms": round(1e3 * lat_s[int(len(lat_s) * 0.99)], 1),
        "mean_batch_fill": stats["mean_batch_fill"],
        "batches": stats["batches"],
    }
    print(json.dumps(result))
    srv.stop()


if __name__ == "__main__":
    main()
