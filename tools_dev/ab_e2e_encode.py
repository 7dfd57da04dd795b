"""Same-session e2e A/B of the ViT-B bf16 encode path: merged full-block
dispatch vs two-kernel, through the full bench pipeline (eval
preprocessing + tower + projection).

Usage: PYTHONPATH=/root/.axon_site:. python tools_dev/ab_e2e_encode.py [iters]
"""

from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.fast_vit import vit_encode_block_fused
    from aihab_clip_tpu.ops.preprocess import eval_transform

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    log(f"device: {jax.devices()[0]}")
    bundle = load("random:ViT-B/16", dtype=jnp.bfloat16,
                  param_dtype=jnp.bfloat16, seed=0)
    params, config = bundle.params, bundle.config
    res = config.image_resolution
    bs = 256
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(bs, res, res, 3),
                                    dtype=np.uint8))

    @partial(jax.jit, static_argnames=("n", "merge"))
    def bench_n(params, images_u8, n, merge):
        def body(i, acc):
            x = eval_transform(images_u8 ^ i.astype(jnp.uint8), res,
                               dtype=jnp.bfloat16)
            _, feats = vit_encode_block_fused(params, x, config,
                                              project=True,
                                              merge_blocks=merge)
            return acc + jnp.sum(feats.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    results = {}
    for merge in ("auto", "off", "auto"):
        tag = f"merge={merge}" + ("" if merge not in results else " (re)")
        t0 = time.perf_counter()
        float(bench_n(params, imgs, 2, merge))
        log(f"  {tag}: short compile+run {time.perf_counter() - t0:.0f}s")
        float(bench_n(params, imgs, iters, merge))
        t0 = time.perf_counter()
        float(bench_n(params, imgs, 2, merge))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(bench_n(params, imgs, iters, merge))
        tl = time.perf_counter() - t0
        ms = (tl - ts) / (iters - 2) * 1e3
        log(f"  {tag}: {ms:.1f} ms/iter -> {bs / ms * 1e3:,.0f} img/s")
        results[tag] = ms
    print(results)


if __name__ == "__main__":
    main()
