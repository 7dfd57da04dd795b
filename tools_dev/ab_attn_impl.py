"""Same-session A/B: attention-core variants inside the merged full-block
kernel (VERDICT r1 item 3 — the last 24% of ViT-B encode MFU).

Variants (see ops/block_kernel._mha_f32):
  base      per-head K=64/N=64 GEMMs, normalized P (r1 dispatch)
  foldnorm  1/sum folded into the PV output rows ([S,D] divides, not [S,S])
  pair      2 heads per GEMM via block-diagonal K/V (full-rate GEMMs,
            half the softmax streams; identical MAC count by algebra)
  batched   batched-head dot_general (r1: Mosaic crash — probe again)

Chains 12 ViT-B blocks in one jitted fori_loop (axon executes lazily —
DEV_NOTES.md), A/B/A with the base variant re-measured last as control.

Usage: python tools_dev/ab_attn_impl.py [iters]
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

B, S, W, HEADS, HIDDEN, LAYERS = 256, 197, 768, 12, 3072, 12


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


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from aihab_clip_tpu.ops.block_kernel import full_block_fused

    rng = np.random.default_rng(0)
    blocks = make_weights(rng, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, S, W)), jnp.bfloat16)

    def tower(impl):
        def f(x, blocks):
            for blk in blocks:
                x = full_block_fused(x, blk["g1"], blk["b1"], blk["wqkv"],
                                     blk["bqkv"], blk["wout"], blk["bout"],
                                     blk["g2"], blk["b2"], blk["wfc"],
                                     blk["bfc"], blk["wpr"], blk["bpr"],
                                     HEADS, mlp_chunks=2, attn_impl=impl)
            return x
        return f

    log(f"device: {jax.devices()[0].device_kind}; "
        f"B={B} S={S} W={W} H={HEADS}")
    r = {}
    r["base"] = bench(tower("base"), x, blocks, iters, "base (dispatched)")
    for impl in ("foldnorm", "pair", "batched"):
        r[impl] = bench(tower(impl), x, blocks, iters, impl)
    r["base_control"] = bench(tower("base"), x, blocks, iters,
                              "base (control)")
    print({k: (round(v, 2) if v is not None else None) for k, v in r.items()})


if __name__ == "__main__":
    main()
