"""ConvNeXt fused-MLP row-tile sweep at each stage shape (r4).

After the banded-dw win the family's remaining gap to 55%+ MFU is the
fused MLP's efficiency at the early (large-spatial, narrow-channel)
stages.  Sweep `convnext_mlp_block`'s ``tile_m`` at every stage's
[M, C] shape (8-layer chained stacks, distinct weights) against the
per-layer GEMM bound.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools_dev/ab_convnext_tiles.py \
           [--batch 128] [--stages 0,1,2,3] [--tiles 128,256,512,1024]
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
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--stages", default="0,1,2,3")
    p.add_argument("--tiles", default="0,128,256,512,1024")
    p.add_argument("--acts", default="gelu_poly",
                   help="comma list; 'gelu_poly:cheb'/'gelu_poly:rational' "
                        "pin AIHAB_ERF_IMPL; 'quick_gelu' probes the "
                        "1-transcendental VPU bound")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--peak_tflops", type=float, default=197.0)
    p.add_argument("--chunks", default="0",
                   help="comma list of n_chunks values (r5: probes "
                        "whether hidden-dim chunking lets Mosaic overlap "
                        "the act VPU work of chunk i with chunk i+1's "
                        "GEMM; 0 = auto)")
    args = p.parse_args()

    from aihab_clip_tpu.ops.block_kernel import convnext_mlp_block
    from aihab_clip_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    reps = args.reps

    def timed(tile_m, weights, x, label, act="gelu_poly", n_chunks=0):
        import os
        if ":" in act:
            act, erf_impl = act.split(":")
            os.environ["AIHAB_ERF_IMPL"] = erf_impl
        else:
            os.environ.pop("AIHAB_ERF_IMPL", None)

        def one(weights, xx):
            for (ls, lb, w1, b1, w2, b2, g) in weights:
                xx = convnext_mlp_block(xx, xx, ls, lb, w1, b1, w2, b2, g,
                                        tile_m=tile_m, act=act,
                                        n_chunks=n_chunks)
            return xx

        def loop(weights, x, n):
            out = jax.lax.fori_loop(
                0, n, lambda i, xx: one(weights, xx), x)
            return jnp.sum(out.astype(jnp.float32))

        j = jax.jit(loop, static_argnames="n")
        try:
            float(j(weights, x, 2))
        except Exception as e:
            print(f"  {label}: FAILED ({str(e)[:90]})", flush=True)
            return
        float(j(weights, x, 2 + args.iters))
        t0 = time.perf_counter(); float(j(weights, x, 2))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter(); float(j(weights, x, 2 + args.iters))
        tl = time.perf_counter() - t0
        ms = (tl - ts) / args.iters / reps * 1e3
        print(f"  {label}: {ms:.3f} ms/layer", flush=True)

    for s in map(int, args.stages.split(",")):
        dim = args.width * 2 ** s
        sp = args.res // 4 // 2 ** s
        m = args.batch * sp * sp
        hidden = 4 * dim
        gf = 2 * m * dim * hidden * 2 / 1e9
        bound_ms = gf / args.peak_tflops
        print(f"stage{s} [M={m}, C={dim}] ({gf:.1f} GF/layer, GEMM bound "
              f"{bound_ms:.3f} ms):", flush=True)
        x = jnp.asarray(rng.standard_normal((m, dim)) * 0.5, jnp.bfloat16)
        weights = []
        for _ in range(reps):
            weights.append((
                jnp.asarray(rng.standard_normal(dim) * 0.1 + 1, jnp.float32),
                jnp.asarray(rng.standard_normal(dim) * 0.1, jnp.float32),
                jnp.asarray(rng.standard_normal((dim, hidden)) * 0.03,
                            jnp.bfloat16),
                jnp.asarray(rng.standard_normal(hidden) * 0.03, jnp.float32),
                jnp.asarray(rng.standard_normal((hidden, dim)) * 0.03,
                            jnp.bfloat16),
                jnp.asarray(rng.standard_normal(dim) * 0.03, jnp.float32),
                jnp.asarray(rng.standard_normal(dim) * 0.1, jnp.float32),
            ))
        for act in args.acts.split(","):
            for t in map(int, args.tiles.split(",")):
                for ch in map(int, args.chunks.split(",")):
                    label = (f"act={act} tile_m={t or 'auto'}"
                             + (f" chunks={ch}" if ch else ""))
                    timed(t, weights, x, label, act=act, n_chunks=ch)


if __name__ == "__main__":
    main()
