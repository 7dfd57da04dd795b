"""ConvNeXt-CLIP encode throughput on TPU (canonical XLA conv path).

Chained-fori_loop methodology (DEV_NOTES.md: the axon tunnel executes
lazily — naive dispatch timing is invalid); eval preprocessing included,
matching the ViT/SigLIP e2e encode numbers in PERF_NOTES.md.  FLOPs come
from XLA's own cost analysis of the compiled step, so the MFU figure
needs no hand-derived GFLOP table.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools_dev/bench_convnext.py \
           [--model convnext_base_w] [--batch 128] [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="convnext_base_w")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--peak_tflops", type=float, default=197.0,
                   help="chip bf16 peak for the MFU figure (v5e measured "
                        "GEMM ceiling, PERF_NOTES.md)")
    args = p.parse_args()

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.fast_vit import encode_image_fastest
    from aihab_clip_tpu.ops.preprocess import eval_transform

    log(f"device: {jax.devices()[0]}")
    bundle = load(f"random:{args.model}", dtype=jnp.bfloat16,
                  param_dtype=jnp.bfloat16, seed=0)
    params, config = bundle.params, bundle.config
    res = config.image_resolution
    bs = args.batch
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(bs, res, res, 3),
                                    dtype=np.uint8))

    def one(params, images_u8):
        x = eval_transform(images_u8, res, dtype=jnp.bfloat16)
        _, feats = encode_image_fastest(bundle.model, params, x, config,
                                        project=True)
        return jnp.sum(feats.astype(jnp.float32))

    def bench_n(params, images_u8, n):
        def body(i, acc):
            return acc + one(params, images_u8 ^ i.astype(jnp.uint8))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    bench = jax.jit(bench_n, static_argnames="n")

    # XLA's flop count for ONE step (the fori_loop body), for MFU
    cost = jax.jit(one).lower(params, imgs).compile().cost_analysis()
    step_flops = float(cost.get("flops", 0.0)) if cost else 0.0

    t0 = time.perf_counter()
    float(bench(params, imgs, 2))
    log(f"compile+run: {time.perf_counter() - t0:.0f}s")
    float(bench(params, imgs, args.iters))  # warm
    t0 = time.perf_counter()
    float(bench(params, imgs, 2 + args.iters))
    t_long = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(bench(params, imgs, 2))
    t_short = time.perf_counter() - t0
    per_iter = (t_long - t_short) / args.iters
    img_s = bs / per_iter
    gf_img = step_flops / bs / 1e9
    mfu = step_flops / per_iter / (args.peak_tflops * 1e12)
    print(f"{args.model} b{bs}@{res}: {per_iter * 1e3:.1f} ms/iter, "
          f"{img_s:,.0f} img/s, {gf_img:.1f} GF/img (XLA cost analysis), "
          f"MFU {mfu:.1%} of {args.peak_tflops} TF/s")


if __name__ == "__main__":
    main()
