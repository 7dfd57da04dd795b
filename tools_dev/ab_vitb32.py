"""ViT-B/32 encode optimization ladder (r4, VERDICT item 2).

ViT-B/32 measured 12,564 img/s / 57.3% MFU in r3 with no optimization
round of its own.  Its merged full-block kernel runs every GEMM at
M = S_pad = 64 rows (S=50 padded to 64) — half an MXU row tile — which
is exactly where multi-image grid programs should pay (the VMEM
objection that killed them at ViT-L does not apply to B/32's 14.1 MB
weight set + tiny per-image working set).  Arms:

  G=1        current dispatch (control)
  G=2/4/8    G images per merged program: GEMMs see G*64 rows
  two-kernel merge_blocks='off' (the pre-merge dispatch)

plus a batch sweep (256/512/1024) at the winning G.  Chained fori_loop
e2e methodology incl. eval preprocessing (DEV_NOTES.md); same-session
A/B/A.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools_dev/ab_vitb32.py \
           [--batches 256,512] [--gs 1,2,4,8] [--iters 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="ViT-B/32")
    p.add_argument("--batches", default="256,512")
    p.add_argument("--gs", default="1,2,4,8,1")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--two_kernel", action="store_true",
                   help="also run the merge_blocks='off' arm")
    p.add_argument("--int8", action="store_true",
                   help="run the int8 merged-kernel G ladder instead "
                        "(AIHAB_INT8_FULL_BLOCK_G per arm; r5 VERDICT "
                        "item 5)")
    p.add_argument("--peak_tflops", type=float, default=197.0)
    args = p.parse_args()

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models import fast_vit
    from aihab_clip_tpu.ops.preprocess import eval_transform
    from aihab_clip_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log(f"device: {jax.devices()[0]}")
    bundle = load(f"random:{args.model}", dtype=jnp.bfloat16,
                  param_dtype=jnp.bfloat16, seed=0)
    params, config = bundle.params, bundle.config
    res = config.image_resolution

    if args.int8:
        from aihab_clip_tpu.models import quant_vit

        qparams = jax.jit(
            lambda p: quant_vit.quantize_vit_params(p, config))(params)

        def encode_int8(qp, x):
            # G comes from AIHAB_INT8_FULL_BLOCK_G, read at trace time —
            # each arm traces its own (n, g)-static bench_n
            _, feats = quant_vit.vit_encode_int8(qp, x, config,
                                                 project=True)
            return feats

        @partial(jax.jit, static_argnames=("n", "g"))
        def bench_int8(qp, images_u8, n, g):
            def body(i, acc):
                x = eval_transform(images_u8 ^ i.astype(jnp.uint8), res,
                                   dtype=jnp.bfloat16)
                return acc + jnp.sum(encode_int8(qp, x).astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        rng = np.random.default_rng(0)
        import os

        for bs in map(int, args.batches.split(",")):
            imgs = jnp.asarray(rng.integers(0, 256, size=(bs, res, res, 3),
                                            dtype=np.uint8))
            print(f"int8 batch {bs}:", flush=True)
            for g in map(int, args.gs.split(",")):
                os.environ["AIHAB_INT8_FULL_BLOCK_G"] = str(g)
                label = f"int8 G={g}"
                try:
                    t0 = time.perf_counter()
                    float(bench_int8(qparams, imgs, 2, g))
                    log(f"  {label}: short compile+run "
                        f"{time.perf_counter() - t0:.0f}s")
                    float(bench_int8(qparams, imgs, 2 + args.iters, g))
                    t0 = time.perf_counter()
                    float(bench_int8(qparams, imgs, 2 + args.iters, g))
                    t_long = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    float(bench_int8(qparams, imgs, 2, g))
                    t_short = time.perf_counter() - t0
                    per_iter = (t_long - t_short) / args.iters
                    print(f"  {label}: {per_iter * 1e3:.1f} ms/iter, "
                          f"{bs / per_iter:,.0f} img/s", flush=True)
                except Exception as e:
                    print(f"  {label}: FAILED ({type(e).__name__}: "
                          f"{str(e)[:120]})", flush=True)
        return

    def encode(params, x, g: int, merge: str):
        plan = fast_vit._fused_block_plan(config, jnp.bfloat16, merge)
        plan["full_g"] = g
        vp = params["visual"]
        h = fast_vit._vit_embed(vp, x, config, jnp.bfloat16)
        h = fast_vit._apply_fused_blocks(vp, h, config, jnp.bfloat16,
                                         start=0,
                                         stop=config.vision_layers,
                                         plan=plan)
        cls_tok = h[:, 0, :]
        pre = fast_vit._ln(cls_tok, vp["ln_post"]["scale"],
                           vp["ln_post"]["bias"])
        return pre @ jnp.asarray(vp["proj"], pre.dtype)

    @partial(jax.jit, static_argnames=("n", "g", "merge"))
    def bench_n(params, images_u8, n, g, merge):
        def body(i, acc):
            x = eval_transform(images_u8 ^ i.astype(jnp.uint8), res,
                               dtype=jnp.bfloat16)
            feats = encode(params, x, g, merge)
            return acc + jnp.sum(feats.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    # MFU from the canonical graph's XLA cost analysis
    def one_xla(params, images_u8):
        x = eval_transform(images_u8, res, dtype=jnp.bfloat16)
        _, feats = bundle.model.apply(
            {"params": params}, x,
            method=type(bundle.model).encode_image, project=True)
        return jnp.sum(feats.astype(jnp.float32))

    rng = np.random.default_rng(0)
    for bs in map(int, args.batches.split(",")):
        imgs = jnp.asarray(rng.integers(0, 256, size=(bs, res, res, 3),
                                        dtype=np.uint8))
        cost = jax.jit(one_xla).lower(params, imgs).compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0)) if cost else 0.0
        print(f"batch {bs} ({step_flops / bs / 1e9:.1f} GF/img):",
              flush=True)

        arms = [("merged", g) for g in map(int, args.gs.split(","))]
        if args.two_kernel:
            arms.append(("off", 1))
        for merge, g in arms:
            label = f"merge={merge} G={g}"
            try:
                t0 = time.perf_counter()
                float(bench_n(params, imgs, 2, g, merge))
                log(f"  {label}: short compile+run "
                    f"{time.perf_counter() - t0:.0f}s")
                float(bench_n(params, imgs, 2 + args.iters, g, merge))
                t0 = time.perf_counter()
                float(bench_n(params, imgs, 2 + args.iters, g, merge))
                t_long = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(bench_n(params, imgs, 2, g, merge))
                t_short = time.perf_counter() - t0
                per_iter = (t_long - t_short) / args.iters
                mfu = step_flops / per_iter / (args.peak_tflops * 1e12)
                print(f"  {label}: {per_iter * 1e3:.1f} ms/iter, "
                      f"{bs / per_iter:,.0f} img/s, MFU {mfu:.1%}",
                      flush=True)
            except Exception as e:  # compile crashes are data, not fatal
                print(f"  {label}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
