"""Headline benchmark: ViT-B/16 image-encode throughput (images/sec/chip).

Measures the steady-state jitted encode path — on-device eval preprocessing
+ bf16 ViT-B/16 forward + projection — on the available accelerator.

Measurement design: the axon TPU tunnel executes lazily (work materializes
on fetch and identical dispatches can be cached), so naive
dispatch-N-times/block-once timing is invalid.  Instead we run the encode
N times *inside one jitted lax.fori_loop* (input varied per iteration to
defeat loop-invariant hoisting, result reduced to a scalar that is
fetched), at two chain lengths; the difference isolates pure per-iteration
device time from fetch/dispatch overhead.

The reference publishes no benchmark numbers (BASELINE.md), so
``vs_baseline`` reports MFU: measured throughput over the chip's analytic
bf16 speed-of-light for this model (~35.1 GFLOPs/image forward for
ViT-B/16 @224).

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


VITB16_GFLOPS_PER_IMAGE = 35.1


def chip_peak_tflops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind or "lite" in kind:
        return 197.0
    if "v4" in kind:
        return 275.0
    if "v5p" in kind:
        return 459.0
    if "v6" in kind:
        return 918.0
    return 197.0


def _probe_devices(timeout_s: float = 900.0):
    """`jax.devices()` with a watchdog: when the axon tunnel is down the
    backend retries connection attempts indefinitely, which would hang the
    driver's bench run — after `timeout_s` we emit the one JSON line
    (value 0, error noted) and exit instead."""
    import threading

    import jax

    result: list = []

    def probe():
        try:
            result.append(jax.devices())
        except Exception as exc:  # backend init failure
            result.append(exc)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if not result or isinstance(result[0], Exception):
        why = ("device backend unavailable (tunnel down?)" if not result
               else f"{type(result[0]).__name__}: {result[0]}")
        log(f"FATAL: {why}")
        print(json.dumps({"metric": "ViT-B/16 image encode throughput",
                          "value": 0.0, "unit": "images/sec/chip",
                          "vs_baseline": 0.0, "error": why}), flush=True)
        raise SystemExit(0)
    return result[0]


def main() -> None:
    from aihab_clip_tpu.utils import honor_jax_platforms_env

    honor_jax_platforms_env()  # let `env JAX_PLATFORMS=cpu python bench.py`
    # run a CPU smoke despite the axon sitecustomize re-export

    import jax

    # persistent compilation cache: repeat driver runs skip the multi-minute
    # cold remote compile when supported by the backend
    try:
        import os

        cache_dir = os.path.expanduser("~/.cache/aihab_clip_tpu/xla_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from aihab_clip_tpu.models import CLIPModel, load
    from aihab_clip_tpu.models.fast_vit import vit_encode_block_fused
    from aihab_clip_tpu.ops.preprocess import eval_transform

    dev = _probe_devices()[0]
    on_tpu = dev.platform == "tpu"
    log(f"device: {dev} ({getattr(dev, 'device_kind', '?')})")

    bundle = load("random:ViT-B/16", dtype=jnp.bfloat16,
                  param_dtype=jnp.bfloat16, seed=0)
    model, params = bundle.model, bundle.params
    res = bundle.config.image_resolution
    config = bundle.config

    @partial(jax.jit, static_argnames=("n",))
    def bench_n(params, images_u8, n):
        def body(i, acc):
            imgs = images_u8 ^ i.astype(jnp.uint8)  # defeat hoisting/caching
            x = eval_transform(imgs, res, dtype=jnp.bfloat16)
            if on_tpu:
                # whole-block fused Pallas encode (parity-tested; measured
                # 1.44x over the canonical XLA tower — PERF_NOTES.md)
                _, feats = vit_encode_block_fused(params, x, config,
                                                  project=True)
            else:
                _, feats = model.apply({"params": params}, x,
                                       method=CLIPModel.encode_image,
                                       project=True)
            return acc + jnp.sum(feats.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    rng = np.random.default_rng(0)
    # batch 512 measured no faster than 256 on v5e; keep one size so a cold
    # driver run pays at most two remote compiles
    batch_sizes = (256,) if on_tpu else (8,)
    n_short, n_long = (2, 12) if on_tpu else (1, 3)

    best_ips, best_bs = 0.0, 0
    for bs in batch_sizes:
        imgs = jnp.asarray(rng.integers(0, 256, size=(bs, res, res, 3),
                                        dtype=np.uint8))
        try:
            t0 = time.perf_counter()
            float(bench_n(params, imgs, n_short))   # compile short
            log(f"batch {bs}: short-chain compile+run "
                f"{time.perf_counter() - t0:.1f}s")
            t0 = time.perf_counter()
            float(bench_n(params, imgs, n_long))    # compile long
            log(f"batch {bs}: long-chain compile+run "
                f"{time.perf_counter() - t0:.1f}s")
        except Exception as exc:
            log(f"batch {bs}: failed ({type(exc).__name__}: {exc}); skipping")
            continue

        # timed, warm executions
        t0 = time.perf_counter()
        float(bench_n(params, imgs, n_short))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(bench_n(params, imgs, n_long))
        t_long = time.perf_counter() - t0

        per_iter = (t_long - t_short) / (n_long - n_short)
        ips = bs / per_iter if per_iter > 0 else 0.0
        log(f"batch {bs}: {per_iter * 1e3:.1f} ms/iter -> {ips:,.0f} img/s "
            f"(chain times {t_short:.2f}s / {t_long:.2f}s)")
        if ips > best_ips:
            best_ips, best_bs = ips, bs

    sol_ips = (chip_peak_tflops(dev) * 1e12
               / (VITB16_GFLOPS_PER_IMAGE * 1e9)) if on_tpu else float("nan")
    mfu = best_ips / sol_ips if on_tpu else 0.0
    log(f"best: batch {best_bs} -> {best_ips:,.0f} img/s"
        + (f"; speed-of-light {sol_ips:,.0f} img/s; MFU {mfu:.2%}"
           if on_tpu else ""))

    print(json.dumps({
        "metric": "ViT-B/16 image encode throughput",
        "value": round(best_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
