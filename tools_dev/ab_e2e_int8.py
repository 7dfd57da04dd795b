"""Same-session e2e int8 ViT encode: merged full-block dispatch (new) —
measures images/s through preprocessing + int8 tower + projection.

Usage: PYTHONPATH=/root/.axon_site:. python tools_dev/ab_e2e_int8.py \
        [model] [batch] [iters]
model: ViT-B/16 (default) or ViT-L/14
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
    from aihab_clip_tpu.models.quant_vit import (quantize_vit_params,
                                                 vit_encode_int8)

    model = sys.argv[1] if len(sys.argv) > 1 else "ViT-B/16"
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    from aihab_clip_tpu.ops.preprocess import eval_transform

    log(f"device: {jax.devices()[0]}; model {model} batch {bs}")
    bundle = load(f"random:{model}", dtype=jnp.bfloat16,
                  param_dtype=jnp.bfloat16, seed=0)
    config = bundle.config
    qparams = jax.jit(lambda p: quantize_vit_params(p, config))(bundle.params)
    res = config.image_resolution
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(bs, res, res, 3),
                                    dtype=np.uint8))

    @partial(jax.jit, static_argnames=("n",))
    def bench_n(qparams, images_u8, n):
        def body(i, acc):
            x = eval_transform(images_u8 ^ i.astype(jnp.uint8), res,
                               dtype=jnp.bfloat16)
            _, feats = vit_encode_int8(qparams, x, config, project=True)
            return acc + jnp.sum(feats.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    t0 = time.perf_counter()
    float(bench_n(qparams, imgs, 2))
    log(f"  short compile+run {time.perf_counter() - t0:.0f}s")
    float(bench_n(qparams, imgs, iters))
    t0 = time.perf_counter()
    float(bench_n(qparams, imgs, 2))
    ts = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(bench_n(qparams, imgs, iters))
    tl = time.perf_counter() - t0
    ms = (tl - ts) / (iters - 2) * 1e3
    log(f"  {ms:.1f} ms/iter -> {bs / ms * 1e3:,.0f} img/s")
    print({"model": model, "batch": bs, "ms_per_iter": ms,
           "img_per_s": bs / ms * 1e3})


if __name__ == "__main__":
    main()
