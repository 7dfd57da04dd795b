"""Generic e2e encode bench: ANY model tag, any dispatch arm (r4).

One harness for the family-table measurements (PERF_NOTES.md): eval
preprocessing + tower + projection, chained-fori_loop, MFU from XLA cost
analysis of the canonical graph.  Arms:

  fastest    the dispatched fast path (what serving/predict run),
             incl. ConvNeXt banded-dw matrices and RN folded BN
  canonical  the Flax module (A/B control)
  int8       the W8A8 tower (ViT / SigLIP / ConvNeXt)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools_dev/bench_encode.py \
           --model ViT-L-16-SigLIP-384 --batch 32 [--impl fastest] \
           [--iters 10]
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


def build_encode(bundle, impl: str):
    """-> (weights, encode(weights, x) -> projected feats).  Mirrors the
    serving engine's path selection (`serving.ClassifierEngine
    ._build_classify`)."""
    from aihab_clip_tpu.models.siglip import SigLIPConfig

    config, params, model = bundle.config, bundle.params, bundle.model
    is_siglip = isinstance(config, SigLIPConfig)
    is_convnext = getattr(config, "vision_tower", "") == "convnext"
    is_rn = (not is_siglip and not is_convnext
             and not config.is_vit)

    if impl == "int8":
        if is_siglip:
            from aihab_clip_tpu.models.quant_siglip import (
                quantize_siglip_params,
                siglip_encode_int8,
            )

            weights = (jax.jit(lambda p: quantize_siglip_params(p, config))(
                params), params)

            def encode(w, x):
                return siglip_encode_int8(w[0], w[1], x, config,
                                          project=True)[1]
        elif is_convnext:
            from aihab_clip_tpu.models.fast_convnext import (
                build_dw_matrices,
                convnext_encode_fused,
                quantize_convnext_mlp,
            )

            weights = (params,
                       jax.jit(lambda p: quantize_convnext_mlp(p, config))(
                           params),
                       build_dw_matrices(params, config))

            def encode(w, x):
                return convnext_encode_fused(w[0], x, config, project=True,
                                             qmlp=w[1], dwmat=w[2])[1]
        elif config.is_vit:
            from aihab_clip_tpu.models.quant_vit import (
                quantize_vit_params,
                vit_encode_int8,
            )

            weights = jax.jit(lambda p: quantize_vit_params(p, config))(
                params)

            def encode(w, x):
                return vit_encode_int8(w, x, config, project=True)[1]
        else:
            raise SystemExit("int8: no RN path (conv tower; the int8 "
                             "kernels quantize GEMM towers)")
    elif impl == "canonical":
        weights = params

        def encode(w, x):
            out = model.apply({"params": w}, x,
                              method=type(model).encode_image, project=True)
            return out[1]
    else:  # fastest
        if is_siglip:
            from aihab_clip_tpu.models.fast_siglip import (
                pack_siglip_fast_params,
            )
            from aihab_clip_tpu.models.fast_vit import encode_image_fastest

            weights = (params, pack_siglip_fast_params(params, config,
                                                       jnp.bfloat16))

            def encode(w, x):
                return encode_image_fastest(model, w[0], x, config,
                                            project=True, packed=w[1])[1]
        elif is_convnext:
            from aihab_clip_tpu.models.fast_convnext import (
                build_dw_matrices,
                convnext_encode_fused,
            )

            weights = (params, build_dw_matrices(params, config))

            def encode(w, x):
                return convnext_encode_fused(w[0], x, config, project=True,
                                             dwmat=w[1])[1]
        elif is_rn:
            from aihab_clip_tpu.models.fast_resnet import (
                fold_resnet_bn,
                resnet_encode_folded,
            )

            weights = fold_resnet_bn(params["visual"], dtype=jnp.bfloat16)

            def encode(w, x):
                return resnet_encode_folded(w, x, config, project=True)[1]
        else:
            from aihab_clip_tpu.models.fast_vit import encode_image_fastest

            weights = params

            def encode(w, x):
                return encode_image_fastest(model, w, x, config,
                                            project=True)[1]
    return weights, encode


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--impl", default="fastest",
                   choices=["fastest", "canonical", "int8"])
    p.add_argument("--peak_tflops", type=float, default=197.0)
    args = p.parse_args()

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.ops.preprocess import (
        eval_transform,
        normalize_stats_for,
    )
    from aihab_clip_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log(f"device: {jax.devices()[0]}")
    bundle = load(f"random:{args.model}", dtype=jnp.bfloat16,
                  param_dtype=jnp.bfloat16, seed=0)
    params, config = bundle.params, bundle.config
    res = config.image_resolution
    bs = args.batch
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(bs, res, res, 3),
                                    dtype=np.uint8))
    nmean, nstd = normalize_stats_for(config)

    weights, encode = build_encode(bundle, args.impl)

    @partial(jax.jit, static_argnames="n")
    def bench(w, images_u8, n):
        def body(i, acc):
            x = eval_transform(images_u8 ^ i.astype(jnp.uint8), res,
                               dtype=jnp.bfloat16, mean=nmean, std=nstd)
            return acc + jnp.sum(encode(w, x).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    # MFU denominator: canonical graph cost analysis (pallas_calls are
    # invisible to cost analysis; math is identical across arms)
    def one_xla(params, images_u8):
        x = eval_transform(images_u8, res, dtype=jnp.bfloat16,
                           mean=nmean, std=nstd)
        out = bundle.model.apply({"params": params}, x,
                                 method=type(bundle.model).encode_image,
                                 project=True)
        return jnp.sum(out[1].astype(jnp.float32))

    cost = jax.jit(one_xla).lower(params, imgs).compile().cost_analysis()
    step_flops = float(cost.get("flops", 0.0)) if cost else 0.0

    t0 = time.perf_counter()
    float(bench(weights, imgs, 2))
    log(f"compile+run (short): {time.perf_counter() - t0:.0f}s")
    float(bench(weights, imgs, 2 + args.iters))
    t0 = time.perf_counter()
    float(bench(weights, imgs, 2 + args.iters))
    t_long = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(bench(weights, imgs, 2))
    t_short = time.perf_counter() - t0
    per_iter = (t_long - t_short) / args.iters
    mfu = step_flops / per_iter / (args.peak_tflops * 1e12)
    print(f"{args.model} b{bs}@{res} impl={args.impl}: "
          f"{per_iter * 1e3:.1f} ms/iter, {bs / per_iter:,.0f} img/s, "
          f"{step_flops / bs / 1e9:.1f} GF/img, MFU {mfu:.1%}")


if __name__ == "__main__":
    main()
