"""ModifiedResNet encode: component breakdown + folded-BN A/B (r4).

VERDICT r3 item 3: RN50's 43% MFU was justified by assertion; produce
the component table (stem / stage1-4 / attnpool / preprocess) like
ConvNeXt's, and A/B the exact FrozenBN fold
(`models/fast_resnet.fold_resnet_bn`).  Chained-fori_loop methodology;
FLOPs from XLA cost analysis (MFU needs no hand-derived table).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools_dev/bench_resnet.py \
           [--model RN50] [--batch 256] [--impl fastest|xla] [--components]
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


def bench_components(args, bundle):
    """Per-component times: run the tower truncated at successive points
    and difference the chained readings."""
    from aihab_clip_tpu.models.fast_resnet import (
        _attnpool,
        _avg_pool,
        _bottleneck,
        _conv,
        fold_resnet_bn,
    )
    from aihab_clip_tpu.ops.preprocess import eval_transform

    params, config = bundle.params, bundle.config
    res = config.image_resolution
    folded = fold_resnet_bn(params["visual"], dtype=jnp.bfloat16)
    bs = args.batch
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(bs, res, res, 3),
                                    dtype=np.uint8))
    layers = tuple(config.vision_layers)
    strides = [1, 2, 2, 2]

    def run_to(fv, images_u8, upto: int):
        """upto: 0=preprocess only, 1=+stem, 2..5=+stage1..4, 6=+pool."""
        x = eval_transform(images_u8, res, dtype=jnp.bfloat16)
        if upto >= 1:
            x = jax.nn.relu(_conv(x, fv["conv1"], stride=2, pad=1))
            x = jax.nn.relu(_conv(x, fv["conv2"], pad=1))
            x = jax.nn.relu(_conv(x, fv["conv3"], pad=1))
            x = _avg_pool(x, 2)
        for stage in range(1, 5):
            if upto >= stage + 1:
                for blk in range(layers[stage - 1]):
                    x = _bottleneck(fv[f"layer{stage}_{blk}"], x,
                                    stride=strides[stage - 1]
                                    if blk == 0 else 1)
        if upto >= 6:
            x = _attnpool(fv["attnpool"], x, config.vision_heads,
                          project=False)
        return jnp.sum(x.astype(jnp.float32))

    @partial(jax.jit, static_argnames=("n", "upto"))
    def bench_n(fv, images_u8, n, upto):
        def body(i, acc):
            return acc + run_to(fv, images_u8 ^ i.astype(jnp.uint8), upto)
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    names = ["preprocess", "stem", "stage1", "stage2", "stage3", "stage4",
             "attnpool"]
    times, flops = [], []
    for upto in range(7):
        cost = (jax.jit(run_to, static_argnames="upto")
                .lower(folded, imgs, upto=upto).compile().cost_analysis())
        flops.append(float(cost.get("flops", 0.0)) if cost else 0.0)
        float(bench_n(folded, imgs, 2, upto))
        float(bench_n(folded, imgs, 2 + args.iters, upto))
        t0 = time.perf_counter()
        float(bench_n(folded, imgs, 2 + args.iters, upto))
        t_long = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(bench_n(folded, imgs, 2, upto))
        t_short = time.perf_counter() - t0
        times.append((t_long - t_short) / args.iters * 1e3)
        delta = times[-1] - (times[-2] if upto else 0.0)
        dflops = flops[-1] - (flops[-2] if upto else 0.0)
        mfu = (dflops / (delta * 1e-3) / (args.peak_tflops * 1e12)
               if delta > 0 else float("nan"))
        print(f"  through {names[upto]}: {times[-1]:.1f} ms "
              f"(+{delta:.1f}, {dflops / 1e9:.0f} GF, "
              f"stage MFU {mfu:.1%})", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="RN50")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--components", action="store_true")
    p.add_argument("--impl", default="fastest",
                   choices=["fastest", "xla"],
                   help="fastest = folded-BN forward; xla = canonical "
                        "Flax module (A/B control)")
    p.add_argument("--peak_tflops", type=float, default=197.0)
    args = p.parse_args()

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log(f"device: {jax.devices()[0]}")
    bundle = load(f"random:{args.model}", dtype=jnp.bfloat16,
                  param_dtype=jnp.bfloat16, seed=0)
    if args.components:
        bench_components(args, bundle)
        return

    from aihab_clip_tpu.models.fast_resnet import (
        fold_resnet_bn,
        resnet_encode_folded,
    )
    from aihab_clip_tpu.ops.preprocess import eval_transform

    params, config = bundle.params, bundle.config
    res = config.image_resolution
    bs = args.batch
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(bs, res, res, 3),
                                    dtype=np.uint8))
    folded = fold_resnet_bn(params["visual"], dtype=jnp.bfloat16) \
        if args.impl == "fastest" else None

    def one(params, folded_v, images_u8):
        x = eval_transform(images_u8, res, dtype=jnp.bfloat16)
        if args.impl == "fastest":
            _, feats = resnet_encode_folded(folded_v, x, config,
                                            project=True)
        else:
            _, feats = bundle.model.apply(
                {"params": params}, x,
                method=type(bundle.model).encode_image, project=True)
        return jnp.sum(feats.astype(jnp.float32))

    @partial(jax.jit, static_argnames="n")
    def bench(params, folded_v, images_u8, n):
        def body(i, acc):
            return acc + one(params, folded_v,
                             images_u8 ^ i.astype(jnp.uint8))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    def one_xla(params, images_u8):
        x = eval_transform(images_u8, res, dtype=jnp.bfloat16)
        _, feats = bundle.model.apply(
            {"params": params}, x,
            method=type(bundle.model).encode_image, project=True)
        return jnp.sum(feats.astype(jnp.float32))

    cost = jax.jit(one_xla).lower(params, imgs).compile().cost_analysis()
    step_flops = float(cost.get("flops", 0.0)) if cost else 0.0

    t0 = time.perf_counter()
    float(bench(params, folded, imgs, 2))
    log(f"compile+run (short): {time.perf_counter() - t0:.0f}s")
    float(bench(params, folded, imgs, 2 + args.iters))
    t0 = time.perf_counter()
    float(bench(params, folded, imgs, 2 + args.iters))
    t_long = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(bench(params, folded, imgs, 2))
    t_short = time.perf_counter() - t0
    per_iter = (t_long - t_short) / args.iters
    mfu = step_flops / per_iter / (args.peak_tflops * 1e12)
    print(f"{args.model} b{bs}@{res} impl={args.impl}: "
          f"{per_iter * 1e3:.1f} ms/iter, {bs / per_iter:,.0f} img/s, "
          f"{step_flops / bs / 1e9:.1f} GF/img, MFU {mfu:.1%}")


if __name__ == "__main__":
    main()
