"""Same-session A/B: ViT-L@224 attention-half variants.

The analytic time model (PERF_NOTES "ViT-B attention core" methodology)
predicts ~920 img/s / 73% MFU for ViT-L@224 b128; measured is 763 / 61%,
and the per-block decomposition puts the excess in the ATTENTION half
(whole-kernel `attn_block_fused`, 16 heads unrolled at S_pad=272).
Candidates:

  * whole attention kernel (current dispatch at 224px)
  * head-group-split attention (`attn_block_split`, the SigLIP/336px
    kernel) at n_groups 2/4/8 — more grid parallelism, smaller per-
    program working sets
  * XLA attention (per-op path) as the floor

Each arm chains 12 ViT-L-shaped ATTENTION halves (MLP excluded — it
already runs at ~95% of its GEMM bound) in one jitted fori_loop, A/B/A.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools_dev/ab_vitl_attn.py [iters] [batch]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from aihab_clip_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

B, S, W, HEADS, LAYERS = 128, 257, 1024, 16, 12


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
        float(chain(x, blocks, iters))
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
    log(f"  {tag}: {ms:.1f} ms / {LAYERS} attn halves "
        f"({ms / LAYERS:.2f} ms each)")
    return ms


def main():
    global B
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    if len(sys.argv) > 2:
        B = int(sys.argv[2])
    from aihab_clip_tpu.ops.attention import attention, xla_attention_dispatch
    from aihab_clip_tpu.ops.block_kernel import (attn_block_fused,
                                                 attn_block_split,
                                                 regroup_attn_weights_f)

    rng = np.random.default_rng(0)
    blocks = []
    for _ in range(LAYERS):
        blocks.append(dict(
            g1=jnp.asarray(rng.standard_normal(W), jnp.float32),
            b1=jnp.asarray(rng.standard_normal(W) * 0.1, jnp.float32),
            wqkv=jnp.asarray(rng.standard_normal((W, 3 * W)) * 0.02,
                             jnp.bfloat16),
            bqkv=jnp.asarray(rng.standard_normal(3 * W) * 0.1, jnp.float32),
            wout=jnp.asarray(rng.standard_normal((W, W)) * 0.02,
                             jnp.bfloat16),
            bout=jnp.asarray(rng.standard_normal(W) * 0.1, jnp.float32),
        ))
    x = jnp.asarray(rng.standard_normal((B, S, W)), jnp.bfloat16)
    log(f"device: {jax.devices()[0].device_kind}; B={B} S={S} W={W} H={HEADS}")

    def whole(x, blocks):
        for blk in blocks:
            x = attn_block_fused(x, blk["g1"], blk["b1"], blk["wqkv"],
                                 blk["bqkv"], blk["wout"], blk["bout"], HEADS)
        return x

    def split(n_groups):
        grouped = [regroup_attn_weights_f(blk["wqkv"], blk["bqkv"],
                                          blk["wout"], HEADS, n_groups)
                   for blk in blocks]

        def f(x, blocks):
            for blk, (wg, bg, og) in zip(blocks, grouped):
                x = attn_block_split(x, wg, bg, og, blk["bout"],
                                     blk["g1"], blk["b1"], HEADS, n_groups)
            return x
        return f

    def xla_path(x, blocks):
        from aihab_clip_tpu.models.fast_vit import _ln
        with xla_attention_dispatch():
            for blk in blocks:
                ln1 = _ln(x.astype(jnp.float32), blk["g1"], blk["b1"])
                qkv = (ln1.astype(jnp.bfloat16) @ blk["wqkv"]
                       ).astype(jnp.float32) + blk["bqkv"]
                q, k, v = jnp.split(qkv.astype(jnp.bfloat16), 3, axis=-1)
                attn = attention(q, k, v, HEADS)
                x = (x + (attn @ blk["wout"]).astype(jnp.float32)
                     + blk["bout"]).astype(x.dtype)
        return x

    r = {}
    r["whole"] = bench(whole, x, blocks, iters, "whole attn (dispatched)")
    for n in (2, 4, 8):
        r[f"split{n}"] = bench(split(n), x, blocks, iters,
                               f"head-group split n={n}")
    r["xla"] = bench(xla_path, x, blocks, iters, "XLA per-op")
    r["whole_control"] = bench(whole, x, blocks, iters,
                               "whole attn (control)")
    print({k: (round(v, 2) if v is not None else None) for k, v in r.items()})


if __name__ == "__main__":
    main()
