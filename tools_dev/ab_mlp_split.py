"""Same-session A/B: mlp_block_split variants on the split-MLP towers.

Arms (ViT-L and SigLIP-SO400M MLP shapes — the towers that actually
dispatch the hidden-dim-split kernel):

  * ``base``        — current production: bf16 partial through HBM,
                      acc-free first chunk (ROADMAP follow-up 2 landed).
  * ``f32_partial`` — fp32 running partial through HBM (one fewer bf16
                      rounding per chunk boundary, 2x inter-chunk
                      traffic; ROADMAP follow-up 1).

Also prints the max |bf16-partial − f32-partial| over the chained tower
output so the accuracy half of the trade is measured on the same run.

Chains LAYERS blocks inside one jitted fori_loop (the only valid timing
under the axon tunnel — see DEV_NOTES.md).

Usage: python tools_dev/ab_mlp_split.py [vitl|siglip|both] [iters]
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

# (rows M, width W, hidden H, n_chunks, layers)
SHAPES = {
    "vitl": (128 * 257, 1024, 4096, 2, 12),
    "siglip": (16 * 736, 1152, 4304, 2, 13),   # SO400M: 13 of 27 (time)
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_blocks(rng, w, hidden, layers, dtype):
    blocks = []
    for _ in range(layers):
        blocks.append(dict(
            g2=jnp.asarray(rng.standard_normal(w), jnp.float32),
            b2=jnp.asarray(rng.standard_normal(w) * 0.1, jnp.float32),
            wfc=jnp.asarray(rng.standard_normal((w, hidden)) * 0.02, dtype),
            bfc=jnp.asarray(rng.standard_normal(hidden) * 0.1, jnp.float32),
            wpr=jnp.asarray(rng.standard_normal((hidden, w)) * 0.02, dtype),
            bpr=jnp.asarray(rng.standard_normal(w) * 0.1, jnp.float32),
        ))
    return blocks


def bench(fn, x, blocks, iters, layers, tag):
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
    log(f"  {tag}: {ms:.1f} ms / {layers} blocks "
        f"({ms / layers:.2f} ms/block)")
    return ms


def run(shape_key, iters):
    from aihab_clip_tpu.ops.block_kernel import mlp_block_split

    m, w, hidden, n_chunks, layers = SHAPES[shape_key]
    act = "gelu_tanh" if shape_key == "siglip" else "quick_gelu"
    rng = np.random.default_rng(0)
    blocks = make_blocks(rng, w, hidden, layers, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((m, w)), jnp.bfloat16)

    def tower(f32_partial):
        def f(x, blocks):
            for blk in blocks:
                x = mlp_block_split(x, blk["g2"], blk["b2"], blk["wfc"],
                                    blk["bfc"], blk["wpr"], blk["bpr"],
                                    n_chunks=n_chunks, act=act,
                                    f32_partial=f32_partial)
            return x
        return f

    log(f"{shape_key}: M={m} W={w} hid={hidden} chunks={n_chunks} "
        f"L={layers} act={act}")
    r = {}
    r["base"] = bench(tower(False), x, blocks, iters, layers, "base (bf16 partial)")
    r["f32_partial"] = bench(tower(True), x, blocks, iters, layers, "f32 partial")
    r["base_control"] = bench(tower(False), x, blocks, iters, layers,
                              "base (control)")

    # accuracy half of the trade: chained-tower output drift
    if r["base"] is None or r["f32_partial"] is None:
        return r
    y16 = jax.jit(tower(False))(x, blocks).astype(jnp.float32)
    y32 = jax.jit(tower(True))(x, blocks).astype(jnp.float32)
    drift = float(jnp.max(jnp.abs(y16 - y32)))
    scale = float(jnp.max(jnp.abs(y32)))
    log(f"  drift: max|bf16−f32 partial| = {drift:.3e} "
        f"(max|y| = {scale:.3e}, rel {drift / max(scale, 1e-9):.2e})")
    r["drift_abs"], r["drift_rel"] = drift, drift / max(scale, 1e-9)
    return r


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    # >= 4: timing subtracts a 2-iter short run, so iters <= 2 would divide
    # by zero after the expensive compile
    iters = max(int(sys.argv[2]) if len(sys.argv) > 2 else 8, 4)
    log(f"device: {jax.devices()[0]}")
    out = {}
    for key in (("vitl", "siglip") if mode == "both" else (mode,)):
        out[key] = run(key, iters)
    print(out)
