"""A/B eval-preprocessing formulations at the real-data shape
(uint8 439x439 -> AA-bicubic resize 224 -> center crop -> normalize).

Variants (all plain XLA; chained fori_loop timing):
  current   — eval_transform (jax.image.resize on NHWC)
  cf32      — channels-first two-einsum resize, f32 weights
  cbf16x2   — channels-first, weights split hi+lo bf16 (exact-ish)
  cbf16     — channels-first, plain bf16 weights (accuracy probe only)

Usage: PYTHONPATH=/root/.axon_site:. python tools_dev/ab_preprocess.py [iters]
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


def _keys_cubic(x, a=-0.5):
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    w1 = (a + 2) * x3 - (a + 3) * x2 + 1
    w2 = a * x3 - 5 * a * x2 + 8 * a * x - 4 * a
    return np.where(x <= 1, w1, np.where(x < 2, w2, 0.0))


def resize_weight_mat(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] AA bicubic weights — replicates jax.image.resize
    (scale=out/in, translation 0, Keys a=-0.5, antialias)."""
    scale = out_size / in_size
    inv_scale = 1.0 / scale
    kernel_scale = max(inv_scale, 1.0)
    sample_f = (np.arange(out_size) + 0.5) * inv_scale - 0.5
    x = np.abs(sample_f[:, None] - np.arange(in_size)[None, :]) / kernel_scale
    w = _keys_cubic(x)
    total = w.sum(axis=1, keepdims=True)
    w = np.where(np.abs(total) > 1000 * np.finfo(np.float32).eps,
                 w / np.where(total != 0, total, 1), 0)
    ok = (sample_f >= -0.5) & (sample_f <= in_size - 0.5)
    return np.where(ok[:, None], w, 0).astype(np.float32)


def crop_weight_mats(h: int, w: int, res: int):
    """Rh [res, h], Rw [res, w]: resize-shorter-side + center-crop composed."""
    scale = res / min(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    mh = resize_weight_mat(h, nh)
    mw = resize_weight_mat(w, nw)
    top, left = (nh - res) // 2, (nw - res) // 2
    return mh[top:top + res], mw[left:left + res]


def make_variants(h, w, res, dtype):
    rh, rw = crop_weight_mats(h, w, res)
    from aihab_clip_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)

    def norm(x):
        return ((x * (1.0 / 255.0) - mean[:, None, None])
                / std[:, None, None]).astype(dtype)

    def cf(u8, rh_, rw_, wdtype):
        x = u8.astype(jnp.float32).transpose(0, 3, 1, 2)   # [B, C, H, W]
        x = x.astype(wdtype)
        t = jnp.einsum("oh,bchw->bcow", rh_.astype(wdtype), x,
                       preferred_element_type=jnp.float32)
        o = jnp.einsum("pw,bcow->bcop", rw_.astype(wdtype),
                       t.astype(wdtype),
                       preferred_element_type=jnp.float32)
        return norm(o).transpose(0, 2, 3, 1)               # [B, res, res, C]

    rh_j, rw_j = jnp.asarray(rh), jnp.asarray(rw)
    rh_hi = rh_j.astype(jnp.bfloat16)
    rw_hi = rw_j.astype(jnp.bfloat16)
    rh_lo = (rh_j - rh_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    rw_lo = (rw_j - rw_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def cf32(u8):
        return cf(u8, rh_j, rw_j, jnp.float32)

    def cbf16(u8):
        return cf(u8, rh_hi, rw_hi, jnp.bfloat16)

    def cbf16x2(u8):
        x = u8.astype(jnp.float32).transpose(0, 3, 1, 2).astype(jnp.bfloat16)
        t = (jnp.einsum("oh,bchw->bcow", rh_hi, x,
                        preferred_element_type=jnp.float32)
             + jnp.einsum("oh,bchw->bcow", rh_lo, x,
                          preferred_element_type=jnp.float32))
        tb = t.astype(jnp.bfloat16)
        o = (jnp.einsum("pw,bcow->bcop", rw_hi, tb,
                        preferred_element_type=jnp.float32)
             + jnp.einsum("pw,bcow->bcop", rw_lo, tb,
                          preferred_element_type=jnp.float32))
        return norm(o).transpose(0, 2, 3, 1)

    return {"cf32": cf32, "cbf16x2": cbf16x2, "cbf16": cbf16}


def main():
    from aihab_clip_tpu.ops.preprocess import eval_transform

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    h = w = 439
    res = 224
    bs = 256
    dtype = jnp.bfloat16
    log(f"device: {jax.devices()[0]}; {bs}x{h}x{w} -> {res}")
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (bs, h, w, 3), np.uint8))

    variants = {"current": lambda u8: eval_transform(u8, res, dtype=dtype)}
    variants.update(make_variants(h, w, res, dtype))

    # accuracy vs current (f32 compare)
    ref = np.asarray(eval_transform(imgs[:8], res, dtype=jnp.float32),
                     np.float32)
    for name, fn in variants.items():
        if name == "current":
            continue
        out = np.asarray(fn(imgs[:8]), np.float32)
        err = np.abs(out - ref).max()
        log(f"  {name}: max abs err vs current = {err:.5f} "
            f"({err * 255 * 0.27:.3f} u8 levels)")

    for name, fn in variants.items():
        @partial(jax.jit, static_argnames=("n",))
        def bench_n(u8, n, fn=fn):
            def body(i, acc):
                x = fn(u8 ^ i.astype(jnp.uint8))
                return acc + jnp.sum(x.astype(jnp.float32))
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        t0 = time.perf_counter()
        float(bench_n(imgs, 2))
        log(f"  {name}: compile {time.perf_counter() - t0:.0f}s")
        float(bench_n(imgs, iters))
        t0 = time.perf_counter()
        float(bench_n(imgs, 2))
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(bench_n(imgs, iters))
        tl = time.perf_counter() - t0
        ms = (tl - ts) / (iters - 2) * 1e3
        log(f"  {name}: {ms:.2f} ms/iter (batch {bs})")


if __name__ == "__main__":
    main()
