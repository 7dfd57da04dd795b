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


def bench_components(args):
    """Localize ConvNeXt step time: time stacks of each block component
    (depthwise 7x7 / LN / pointwise MLP / full block) at each stage's
    (spatial, channels) shape.  Same chained-fori_loop methodology."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from aihab_clip_tpu.models.convnext import ConvNeXtBlock

    res, width = 256, 128
    depths = (3, 3, 27, 3)
    bs = args.batch
    reps = 8                                 # blocks per timed stack

    def timed(fn, params, x):
        # the activation itself is the loop carry (chains the real compute,
        # defeats hoisting); full-sum fetch defeats channel DCE
        def body(i, xx):
            return fn(params, xx)
        def loop(params, x, n):
            out = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(out.astype(jnp.float32))
        j = jax.jit(loop, static_argnames="n")
        float(j(params, x, 2))                  # compile short
        float(j(params, x, 2 + args.iters))     # compile long (MUST be warm
        # before timing: a cold remote compile inside the timed window was
        # the r2 "66 img/s ConvNeXt" artifact)
        t0 = time.perf_counter(); float(j(params, x, 2))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter(); float(j(params, x, 2 + args.iters))
        t_long = time.perf_counter() - t0
        return (t_long - t_short) / args.iters / reps * 1e3  # ms/unit

    for s, depth in enumerate(depths):
        dim = width * 2 ** s
        sp = res // 4 // 2 ** s
        x = jnp.zeros((bs, sp, sp, dim), jnp.bfloat16)
        rng = jax.random.PRNGKey(0)

        class DWStack(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(reps):
                    x = nn.Conv(dim, (7, 7), padding="SAME",
                                feature_group_count=dim, dtype=jnp.bfloat16,
                                param_dtype=jnp.bfloat16,
                                name=f"dw{i}")(x)
                return x

        class MLPStack(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(reps):
                    h = nn.Dense(4 * dim, dtype=jnp.bfloat16,
                                 param_dtype=jnp.bfloat16, name=f"a{i}")(x)
                    h = nn.gelu(h, approximate=False)
                    x = x + nn.Dense(dim, dtype=jnp.bfloat16,
                                     param_dtype=jnp.bfloat16,
                                     name=f"b{i}")(h)
                return x

        class BlockStack(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(reps):
                    x = ConvNeXtBlock(dim, dtype=jnp.bfloat16,
                                      param_dtype=jnp.bfloat16,
                                      name=f"blk{i}")(x)
                return x

        row = [f"stage{s} {sp}x{sp}x{dim} (depth {depth}):"]
        for label, mod in (("dw7x7", DWStack()), ("mlp", MLPStack()),
                           ("block", BlockStack())):
            params = mod.init(rng, x)
            ms = timed(lambda p, xx, m=mod: m.apply(p, xx), params, x)
            row.append(f"{label} {ms:.3f} ms")
        print("  ".join(row), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="convnext_base_w")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--components", action="store_true",
                   help="bench per-stage block components instead of e2e")
    p.add_argument("--impl", default="fastest",
                   choices=["fastest", "nodw", "xla", "int8"],
                   help="fastest = dispatched path (fused MLP kernels + "
                        "banded-matmul dw where it fits); "
                        "nodw = fused MLP kernels, XLA depthwise (r3 "
                        "dispatch, A/B control); "
                        "xla = canonical Flax module (A/B control); "
                        "int8 = W8A8 MLP kernels (serving density path)")
    p.add_argument("--dw_max_mb", type=int, default=0,
                   help="override the per-layer banded-dw byte cap (MB)")
    p.add_argument("--peak_tflops", type=float, default=197.0,
                   help="chip bf16 peak for the MFU figure (v5e measured "
                        "GEMM ceiling, PERF_NOTES.md)")
    args = p.parse_args()

    from aihab_clip_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    if args.components:
        log(f"device: {jax.devices()[0]}")
        bench_components(args)
        return

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

    qmlp = None
    if args.impl == "int8":
        import jax as _jax

        from aihab_clip_tpu.models.fast_convnext import quantize_convnext_mlp

        qmlp = _jax.jit(lambda p: quantize_convnext_mlp(p, config))(params)

    dwmat = None
    if args.impl in ("fastest", "int8"):
        from aihab_clip_tpu.models.fast_convnext import (
            DW_MAT_MAX_BYTES,
            build_dw_matrices,
        )

        cap = args.dw_max_mb * 2 ** 20 if args.dw_max_mb else \
            DW_MAT_MAX_BYTES
        dwmat = build_dw_matrices(params, config, dtype=jnp.bfloat16,
                                  max_bytes=cap)
        n = 0 if dwmat is None else len(dwmat)
        log(f"banded dw matrices: {n} blocks, "
            f"{0 if dwmat is None else sum(a.size * 2 for a in dwmat.values()) / 1e9:.2f} GB")

    def one(params, dwm, images_u8):
        x = eval_transform(images_u8, res, dtype=jnp.bfloat16)
        if args.impl == "xla":
            _, feats = bundle.model.apply(
                {"params": params}, x,
                method=type(bundle.model).encode_image, project=True)
        elif args.impl == "int8":
            from aihab_clip_tpu.models.fast_convnext import (
                convnext_encode_fused,
            )

            _, feats = convnext_encode_fused(params, x, config,
                                             project=True, qmlp=qmlp,
                                             dwmat=dwm)
        elif args.impl == "nodw":
            from aihab_clip_tpu.models.fast_convnext import (
                convnext_encode_fused,
            )

            _, feats = convnext_encode_fused(params, x, config,
                                             project=True)
        else:
            from aihab_clip_tpu.models.fast_convnext import (
                convnext_encode_fused,
            )

            _, feats = convnext_encode_fused(params, x, config,
                                             project=True, dwmat=dwm)
        return jnp.sum(feats.astype(jnp.float32))

    # dwmat rides as a jit ARGUMENT: closing over the multi-GB banded
    # matrices oversizes the remote-compile payload (HTTP 413)
    def bench_n(params, dwm, images_u8, n):
        def body(i, acc):
            return acc + one(params, dwm, images_u8 ^ i.astype(jnp.uint8))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    bench = jax.jit(bench_n, static_argnames="n")

    # XLA's flop count for ONE step (the fori_loop body), for MFU.
    # Always counted on the CANONICAL graph: cost analysis cannot see
    # inside a pallas_call, so the fused path would report ~0 FLOPs
    # (the math is identical either way).
    def one_xla(params, images_u8):
        x = eval_transform(images_u8, res, dtype=jnp.bfloat16)
        _, feats = bundle.model.apply(
            {"params": params}, x,
            method=type(bundle.model).encode_image, project=True)
        return jnp.sum(feats.astype(jnp.float32))

    cost = jax.jit(one_xla).lower(params, imgs).compile().cost_analysis()
    step_flops = float(cost.get("flops", 0.0)) if cost else 0.0

    t0 = time.perf_counter()
    float(bench(params, dwmat, imgs, 2))
    log(f"compile+run (short chain): {time.perf_counter() - t0:.0f}s")
    t0 = time.perf_counter()
    float(bench(params, dwmat, imgs, 2 + args.iters))  # compile long chain
    log(f"compile+run (long chain): {time.perf_counter() - t0:.0f}s")
    # timed, warm executions only (a cold remote compile inside the timed
    # window produced the bogus r2 "66 img/s" ConvNeXt reading)
    t0 = time.perf_counter()
    float(bench(params, dwmat, imgs, 2 + args.iters))
    t_long = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(bench(params, dwmat, imgs, 2))
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
