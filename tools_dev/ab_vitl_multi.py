"""Same-session A/B: ViT-L full blocks with multi-image attention programs.

VERDICT r2 item 3 names two untried avenues for the remaining ~3 MFU
points at ViT-L (inter-kernel pipeline drain between the per-block
pallas_calls): (a) multi-image grid programs and (b) weight-streaming
double buffering across the attn/MLP boundary.  (b) was killed on DMA
arithmetic in r2 (PERF_NOTES "rejected on arithmetic"); the amortized
variant (G images per stream sweep) is VMEM-capped at G<=8, where the
re-streamed 16.8 MB MLP pair still costs 16.8*128/8 = 269 MB/block
(~0.34 ms at HBM rate) — at least as large as the drain it would
remove.  This tool measures (a): the whole-block attention kernel with
G images per program (G*S_pad rows per LN/QKV/out GEMM; fewer grid
steps), composed with the dispatched split-2 MLP in the padded stream,
exactly as `_apply_fused_blocks` runs ViT-L@224.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools_dev/ab_vitl_multi.py [iters] [batch]
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
        log(f"  {tag}: FAILED {type(e).__name__}: "
            f"{str(e).splitlines()[0][:160]}")
        return None
    t0 = time.perf_counter()
    float(chain(x, blocks, 2))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chain(x, blocks, iters))
    t_long = time.perf_counter() - t0
    ms = (t_long - t_short) / (iters - 2) * 1e3
    log(f"  {tag}: {ms:.1f} ms / {LAYERS} blocks ({ms / LAYERS:.2f} each)")
    return ms


def main():
    global B
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    if len(sys.argv) > 2:
        B = int(sys.argv[2])
    from aihab_clip_tpu.ops.block_kernel import (attn_block_fused,
                                                 mlp_block_split)

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
            g2=jnp.asarray(rng.standard_normal(W), jnp.float32),
            b2=jnp.asarray(rng.standard_normal(W) * 0.1, jnp.float32),
            wfc=jnp.asarray(rng.standard_normal((W, 4 * W)) * 0.02,
                            jnp.bfloat16),
            bfc=jnp.asarray(rng.standard_normal(4 * W) * 0.1, jnp.float32),
            wpr=jnp.asarray(rng.standard_normal((4 * W, W)) * 0.02,
                            jnp.bfloat16),
            bpr=jnp.asarray(rng.standard_normal(W) * 0.1, jnp.float32),
        ))
    s_pad = ((S + 15) // 16) * 16
    x = jnp.asarray(rng.standard_normal((B, s_pad, W)), jnp.bfloat16)
    log(f"device: {jax.devices()[0].device_kind}; B={B} S={S}->{s_pad} "
        f"W={W} H={HEADS}")

    def stack(g):
        def f(x, blocks):
            b = x.shape[0]
            for blk in blocks:
                x = attn_block_fused(
                    x, blk["g1"], blk["b1"], blk["wqkv"], blk["bqkv"],
                    blk["wout"], blk["bout"], HEADS, padded_io=True,
                    seq_len=S, images_per_program=g)
                x2 = mlp_block_split(
                    x.reshape(b * s_pad, W), blk["g2"], blk["b2"],
                    blk["wfc"], blk["bfc"], blk["wpr"], blk["bpr"],
                    n_chunks=2)
                x = x2.reshape(b, s_pad, W)
            return x
        return f

    r = {}
    r["g1"] = bench(stack(1), x, blocks, iters, "1 image/program (dispatched)")
    for g in (2, 4):
        r[f"g{g}"] = bench(stack(g), x, blocks, iters, f"{g} images/program")
    r["g1_control"] = bench(stack(1), x, blocks, iters, "1 image (control)")
    print({k: (round(v, 2) if v is not None else None) for k, v in r.items()})


if __name__ == "__main__":
    main()
