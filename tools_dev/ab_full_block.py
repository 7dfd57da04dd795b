"""Same-session A/B: merged full-block kernel vs the two-kernel dispatch.

Chains 12 ViT-B-shaped blocks inside one jitted fori_loop (the only valid
timing under the axon tunnel — see DEV_NOTES.md), bf16 and int8.

Usage: python tools_dev/ab_full_block.py [bf16|int8|both] [iters]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

SHAPES = {
    "vitb": (256, 197, 768, 12, 3072, 12),
    "vitl": (128, 257, 1024, 16, 4096, 12),   # 12 of 24 layers (time)
}
B, S, W, HEADS, HIDDEN, LAYERS = SHAPES["vitb"]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_weights(rng, dtype):
    blocks = []
    for _ in range(LAYERS):
        blocks.append(dict(
            g1=jnp.asarray(rng.standard_normal(W), jnp.float32),
            b1=jnp.asarray(rng.standard_normal(W) * 0.1, jnp.float32),
            wqkv=jnp.asarray(rng.standard_normal((W, 3 * W)) * 0.02, dtype),
            bqkv=jnp.asarray(rng.standard_normal(3 * W) * 0.1, jnp.float32),
            wout=jnp.asarray(rng.standard_normal((W, W)) * 0.02, dtype),
            bout=jnp.asarray(rng.standard_normal(W) * 0.1, jnp.float32),
            g2=jnp.asarray(rng.standard_normal(W), jnp.float32),
            b2=jnp.asarray(rng.standard_normal(W) * 0.1, jnp.float32),
            wfc=jnp.asarray(rng.standard_normal((W, HIDDEN)) * 0.02, dtype),
            bfc=jnp.asarray(rng.standard_normal(HIDDEN) * 0.1, jnp.float32),
            wpr=jnp.asarray(rng.standard_normal((HIDDEN, W)) * 0.02, dtype),
            bpr=jnp.asarray(rng.standard_normal(W) * 0.1, jnp.float32),
        ))
    return blocks


def bench(fn, x, blocks, iters, tag):
    @partial(jax.jit, static_argnames=("n",))
    def chain(x, blocks, n):
        def body(i, carry):
            acc, x = carry
            y = fn(x + (i.astype(x.dtype) * 1e-6), blocks)
            return acc + jnp.sum(y.astype(jnp.float32)), x
        acc, _ = jax.lax.fori_loop(0, n, body, (jnp.zeros((), jnp.float32), x))
        return acc

    try:
        t0 = time.perf_counter()
        float(chain(x, blocks, 2))
        log(f"  {tag}: short compile+run {time.perf_counter() - t0:.0f}s")
        t0 = time.perf_counter()
        float(chain(x, blocks, iters))
        log(f"  {tag}: long compile+run {time.perf_counter() - t0:.0f}s")
    except Exception as e:
        log(f"  {tag}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}")
        return None
    t0 = time.perf_counter()
    float(chain(x, blocks, 2))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(x, blocks, iters))
    t_long = time.perf_counter() - t0
    ms = (t_long - t_short) / (iters - 2) * 1e3
    log(f"  {tag}: {ms:.1f} ms / 12 blocks ({ms / LAYERS:.2f} ms/block)")
    return ms


def run_bf16(iters):
    from aihab_clip_tpu.ops.block_kernel import (attn_block_fused,
                                                 full_block_fused,
                                                 mlp_block_fused)

    rng = np.random.default_rng(0)
    blocks = make_weights(rng, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, S, W)), jnp.bfloat16)

    def two_kernel(x, blocks):
        for blk in blocks:
            x = attn_block_fused(x, blk["g1"], blk["b1"], blk["wqkv"],
                                 blk["bqkv"], blk["wout"], blk["bout"], HEADS)
            b, s, w = x.shape
            x = mlp_block_fused(x.reshape(b * s, w), blk["g2"], blk["b2"],
                                blk["wfc"], blk["bfc"], blk["wpr"],
                                blk["bpr"]).reshape(b, s, w)
        return x

    def merged(chunks, vmem_mb):
        def f(x, blocks):
            for blk in blocks:
                x = full_block_fused(x, blk["g1"], blk["b1"], blk["wqkv"],
                                     blk["bqkv"], blk["wout"], blk["bout"],
                                     blk["g2"], blk["b2"], blk["wfc"],
                                     blk["bfc"], blk["wpr"], blk["bpr"],
                                     HEADS, mlp_chunks=chunks,
                                     vmem_limit_mb=vmem_mb)
            return x
        return f

    log("bf16:")
    r = {}
    r["two_kernel"] = bench(two_kernel, x, blocks, iters, "two-kernel (dispatched)")
    for chunks in (2, 1):
        for vmem in (0, 20):
            tag = f"merged chunks={chunks} vmem={vmem or 'default'}"
            r[tag] = bench(merged(chunks, vmem), x, blocks, iters, tag)
            if r[tag] is not None:
                break  # no need to try the raised limit if default works
    r["two_kernel_control"] = bench(two_kernel, x, blocks, iters,
                                    "two-kernel (control)")
    return r


def run_int8(iters):
    from aihab_clip_tpu.ops.quant import quantize_weight
    from aihab_clip_tpu.ops.quant_matmul import (quant_attn_block_fused,
                                                 quant_full_block_fused,
                                                 quant_mlp_block_fused)

    rng = np.random.default_rng(0)
    blocks = []
    for blk in make_weights(rng, jnp.float32):
        q8, qs = quantize_weight(blk["wqkv"])
        o8, osc = quantize_weight(blk["wout"])
        w18, w1s = quantize_weight(blk["wfc"])
        w28, w2s = quantize_weight(blk["wpr"])
        blocks.append(dict(blk, q8=q8, qs=qs, o8=o8, osc=osc, w18=w18,
                           w1s=w1s, w28=w28, w2s=w2s))
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, S, W)),
                    jnp.bfloat16)

    def two_kernel(x, blocks):
        for blk in blocks:
            x = quant_attn_block_fused(x, blk["q8"], blk["qs"], blk["bqkv"],
                                       blk["o8"], blk["osc"], blk["bout"],
                                       blk["g1"], blk["b1"], HEADS)
            b, s, w = x.shape
            x = quant_mlp_block_fused(x.reshape(b * s, w), blk["w18"],
                                      blk["w1s"], blk["bfc"], blk["w28"],
                                      blk["w2s"], blk["bpr"], blk["g2"],
                                      blk["b2"]).reshape(b, s, w)
        return x

    def merged(chunks):
        def f(x, blocks):
            for blk in blocks:
                x = quant_full_block_fused(
                    x, blk["q8"], blk["qs"], blk["bqkv"], blk["o8"],
                    blk["osc"], blk["bout"], blk["g1"], blk["b1"],
                    blk["w18"], blk["w1s"], blk["bfc"], blk["w28"],
                    blk["w2s"], blk["bpr"], blk["g2"], blk["b2"], HEADS,
                    mlp_chunks=chunks)
            return x
        return f

    log("int8:")
    r = {}
    r["two_kernel"] = bench(two_kernel, x, blocks, iters, "two-kernel (dispatched)")
    for chunks in (1, 2):
        tag = f"merged chunks={chunks}"
        r[tag] = bench(merged(chunks), x, blocks, iters, tag)
    r["two_kernel_control"] = bench(two_kernel, x, blocks, iters,
                                    "two-kernel (control)")
    return r


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    if len(sys.argv) > 3:
        B, S, W, HEADS, HIDDEN, LAYERS = SHAPES[sys.argv[3]]
    log(f"device: {jax.devices()[0]} shape B={B} S={S} W={W} H={HEADS} "
        f"hid={HIDDEN} L={LAYERS}")
    out = {}
    if mode in ("bf16", "both"):
        out["bf16"] = run_bf16(iters)
    if mode in ("int8", "both"):
        out["int8"] = run_int8(iters)
    print(out)
