"""Same-session A/B: ViT-L@224 MLP-half variants + full-block composition.

Companion to ab_vitl_attn.py (attention half measured AT model bound:
2.95 ms/block for 12 chained halves).  The remaining ViT-L gap must sit
in the MLP half (hidden-dim-split, 2 sequential kernels) or in the
attn->MLP kernel-boundary drain.  Arms:

  * mlp_block_split n_chunks=2 (dispatched), 3
  * tile_m sweep on the split kernel (0=auto, 256, 512)
  * XLA per-op floor
  * FULL block chain (attn whole + split-2 MLP) to reconcile the halves
    against the known 6.96 ms/block dispatch figure

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools_dev/ab_vitl_mlp.py [iters] [batch]
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

B, S, W, HEADS, HIDDEN, LAYERS = 128, 257, 1024, 16, 4096, 12


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
    log(f"  {tag}: {ms:.1f} ms / {LAYERS} units ({ms / LAYERS:.2f} ms each)")
    return ms


def main():
    global B
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    if len(sys.argv) > 2:
        B = int(sys.argv[2])
    from aihab_clip_tpu.ops.block_kernel import (attn_block_fused,
                                                 mlp_block_split)
    from aihab_clip_tpu.ops.fused_linear import ln_matmul, matmul_residual

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
            wfc=jnp.asarray(rng.standard_normal((W, HIDDEN)) * 0.02,
                            jnp.bfloat16),
            bfc=jnp.asarray(rng.standard_normal(HIDDEN) * 0.1, jnp.float32),
            wpr=jnp.asarray(rng.standard_normal((HIDDEN, W)) * 0.02,
                            jnp.bfloat16),
            bpr=jnp.asarray(rng.standard_normal(W) * 0.1, jnp.float32),
        ))
    xm = jnp.asarray(rng.standard_normal((B * ((S + 15) // 16 * 16), W)),
                     jnp.bfloat16)
    x3 = jnp.asarray(rng.standard_normal((B, S, W)), jnp.bfloat16)
    log(f"device: {jax.devices()[0].device_kind}; B={B} S={S} W={W} "
        f"HID={HIDDEN}; MLP rows M={xm.shape[0]}")

    def mlp(n_chunks, tile_m=0):
        def f(x, blocks):
            for blk in blocks:
                x = mlp_block_split(x, blk["g2"], blk["b2"], blk["wfc"],
                                    blk["bfc"], blk["wpr"], blk["bpr"],
                                    n_chunks=n_chunks, tile_m=tile_m)
            return x
        return f

    def mlp_xla(x, blocks):
        for blk in blocks:
            hdn = ln_matmul(x, blk["g2"], blk["b2"], blk["wfc"],
                            blk["bfc"], "quick_gelu")
            x = matmul_residual(hdn, blk["wpr"], blk["bpr"], x)
        return x

    def full_block(x, blocks):
        for blk in blocks:
            x = attn_block_fused(x, blk["g1"], blk["b1"], blk["wqkv"],
                                 blk["bqkv"], blk["wout"], blk["bout"], HEADS)
            b, s, w = x.shape
            x = mlp_block_split(x.reshape(b * s, w), blk["g2"], blk["b2"],
                                blk["wfc"], blk["bfc"], blk["wpr"],
                                blk["bpr"], n_chunks=2).reshape(b, s, w)
        return x

    def full_block_padded(x, blocks):
        # padded stream: pad once, slice once (the r2 dispatch)
        b, s, w = x.shape
        s_pad = ((s + 15) // 16) * 16
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
        for blk in blocks:
            x = attn_block_fused(x, blk["g1"], blk["b1"], blk["wqkv"],
                                 blk["bqkv"], blk["wout"], blk["bout"],
                                 HEADS, padded_io=True, seq_len=s)
            x = mlp_block_split(x.reshape(b * s_pad, w), blk["g2"],
                                blk["b2"], blk["wfc"], blk["bfc"],
                                blk["wpr"], blk["bpr"],
                                n_chunks=2).reshape(b, s_pad, w)
        return x[:, :s, :]

    r = {}
    r["split2"] = bench(mlp(2), xm, blocks, iters, "split-2 (dispatched)")
    r["split3"] = bench(mlp(3), xm, blocks, iters, "split-3")
    for tm in (256, 512):
        r[f"split2_tm{tm}"] = bench(mlp(2, tm), xm, blocks, iters,
                                    f"split-2 tile_m={tm}")
    r["xla"] = bench(mlp_xla, xm, blocks, iters, "XLA per-op")
    r["split2_control"] = bench(mlp(2), xm, blocks, iters,
                                "split-2 (control)")
    r["full_block"] = bench(full_block, x3, blocks, iters,
                            "FULL block (attn+mlp, slice/re-pad per block)")
    r["full_block_padded"] = bench(full_block_padded, x3, blocks, iters,
                                   "FULL block (padded stream, r2 dispatch)")
    r["full_block_control"] = bench(full_block, x3, blocks, iters,
                                    "FULL block (control)")
    print({k: (round(v, 2) if v is not None else None) for k, v in r.items()})


if __name__ == "__main__":
    main()
