#!/usr/bin/env python
"""Secondary benchmark suite -> BENCHMARKS.md.

Complements the driver-facing headline bench (bench.py: ViT-B/16 encode
images/sec/chip) with the other north-star surfaces:

  * feature-cache write/read bandwidth (GB/s) — the ProLIP data path;
  * ProLIP projector steps/sec on cached features;
  * train-augmentation throughput (fast matmul path);
  * tokenizer throughput (native C++ vs Python).

Device benchmarks chain work inside one jitted fori_loop and fetch a
scalar (see DEV_NOTES.md: the axon tunnel executes lazily).
"""

from __future__ import annotations

import os
import time
from functools import partial
from pathlib import Path

import numpy as np


def bench_cache_io(tmp_dir: Path, n: int = 20000, dim: int = 768,
                   views: int = 3) -> dict:
    from ..cache import read_preprojection_cache, write_preprojection_cache

    rng = np.random.default_rng(0)
    # fp16 input reflects the real pipeline (the encoder casts on device)
    feats = rng.standard_normal((n, dim)).astype(np.float16)
    labels = rng.integers(0, 20, size=n)

    t0 = time.perf_counter()
    manifest = write_preprojection_cache(
        tmp_dir / "bench_cache", lambda v: (feats, labels), views,
        expected_n=n)
    write_s = time.perf_counter() - t0

    # read-to-RAM: mmap=False takes the parallel-pread fast path, so
    # timing the call measures the read itself (every byte lands in a
    # fresh buffer — no mmap page games; the earlier 37.02 figure touched
    # ~1% of mmap'd pages, and the r1 2.98 figure timed an int16
    # checksum, not the read).  Checksum stays OUTSIDE the timed region.
    # Warm figure is best-of-5: this 1-vCPU VM shows multi-hundred-ms
    # scheduling stalls that would otherwise dominate a single sample.
    try:
        os.sync()  # retire the write's dirty pages before timing reads
    except OSError:
        pass
    read_s = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        loaded, _ = read_preprojection_cache(tmp_dir / "bench_cache", views,
                                             mmap=False)
        read_s = min(read_s, time.perf_counter() - t0)
    total = sum(int(v.view(np.int16).sum(dtype=np.int64)) for v in loaded)
    assert total != 0

    nbytes = n * dim * 2 * views  # fp16 on disk
    out = {
        "write_gbps": nbytes / write_s / 1e9,
        "read_gbps": nbytes / read_s / 1e9,
        "manifest_write_gbps": manifest["write_gbps"],
    }

    # cold read (true disk path): only measurable where the page cache
    # can be dropped (root container); silently omitted elsewhere
    try:
        cold_s = float("inf")
        for _ in range(2):
            with open("/proc/sys/vm/drop_caches", "w") as f:
                f.write("3")
            t0 = time.perf_counter()
            loaded, _ = read_preprojection_cache(
                tmp_dir / "bench_cache", views, mmap=False)
            cold_s = min(cold_s, time.perf_counter() - t0)
        out["read_gbps_cold"] = nbytes / cold_s / 1e9
    except OSError:
        pass
    return out


def bench_prolip_step(n: int = 4096, pre: int = 768, emb: int = 512,
                      classes: int = 20, steps_short: int = 500,
                      steps_long: int = 5500) -> dict:
    # the chain delta (5000 full-batch steps) must dwarf the per-call
    # upload + dispatch cost (~seconds through the axon tunnel), or the
    # differenced rate is noise
    import jax
    import jax.numpy as jnp

    from ..train.prolip import ProjectorSpec, train_projector

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((n, pre)).astype(np.float32)
    labels = rng.integers(0, classes, size=n)
    tw = rng.standard_normal((emb, classes)).astype(np.float32)
    tw /= np.linalg.norm(tw, axis=0, keepdims=True)
    init = ProjectorSpec(weight=jnp.asarray(
        rng.standard_normal((pre, emb)).astype(np.float32) * 0.02), bias=None)

    def run(steps):
        train_projector([feats], labels, jnp.asarray(tw), init, 1e-3, 0.1,
                        steps, verbose=False)

    # compile BOTH chain lengths first (an epoch-count change recompiles
    # the scan), then difference two warm runs to drop dispatch overhead
    run(steps_short)
    run(steps_long)
    t0 = time.perf_counter()
    run(steps_short)
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(steps_long)
    t_long = time.perf_counter() - t0
    per = (t_long - t_short) / (steps_long - steps_short)
    return {"full_batch_steps_per_sec": 1.0 / per,
            "samples_per_sec": n / per}


def bench_augmentation(batch: int = 256, src: int = 439, out: int = 224,
                       iters: int = 10) -> dict:
    import jax
    import jax.numpy as jnp

    from ..ops.fast_warp import fast_train_transform

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(batch, src, src, 3),
                                    dtype=np.uint8))

    @partial(jax.jit, static_argnames=("n",))
    def run(im, n):
        def body(i, acc):
            x = fast_train_transform(im ^ i.astype(jnp.uint8),
                                     jax.random.key(0), out,
                                     crop_mode="random", flip=True,
                                     rotation=True, dtype=jnp.bfloat16)
            return acc + jnp.sum(x.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, 0.0)

    for n in (2, iters + 2):
        float(run(imgs, n))
    t0 = time.perf_counter()
    float(run(imgs, 2))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(imgs, iters + 2))
    t2 = time.perf_counter() - t0
    per = (t2 - t1) / iters
    return {"ms_per_batch": per * 1e3, "images_per_sec": batch / per}


def bench_tokenizer(repeats: int = 30) -> dict:
    from ..native import native_bpe_available
    from ..templates import gen_prompts
    from ..tokenizer.bpe import ClipBPETokenizer

    prompts, _ = gen_prompts(use_hierarchy=True, use_descriptive=True)
    texts = prompts * repeats

    py = ClipBPETokenizer(use_native=False)
    py._cache.clear()
    t0 = time.perf_counter()
    for t in texts:
        py.encode(t)
    py_s = time.perf_counter() - t0

    out = {"python_prompts_per_sec": len(texts) / py_s}
    if native_bpe_available():
        nat = ClipBPETokenizer(use_native=True)
        t0 = time.perf_counter()
        for t in texts:
            nat.encode(t)
        nat_s = time.perf_counter() - t0
        out["native_prompts_per_sec"] = len(texts) / nat_s
        out["native_speedup"] = py_s / nat_s
    return out


def main(out_path: str = "BENCHMARKS.md"):
    from ..utils import honor_jax_platforms_env

    honor_jax_platforms_env()
    import tempfile

    import jax

    dev = jax.devices()[0]
    lines = [
        "# BENCHMARKS (secondary suite)",
        "",
        f"Device: `{dev}` ({getattr(dev, 'device_kind', '?')}); "
        f"headline encode benchmark lives in `bench.py`.",
        "",
    ]

    def section(title, results):
        lines.append(f"## {title}")
        lines.append("")
        for k, v in results.items():
            lines.append(f"- {k}: **{v:,.2f}**")
        lines.append("")
        print(f"[bench] {title}: {results}", flush=True)

    with tempfile.TemporaryDirectory() as tmp:
        section("Feature-cache IO (20k x 768 fp16, 3 views)",
                bench_cache_io(Path(tmp)))
    section("ProLIP projector training (4096 x 768 -> 512, full-batch)",
            bench_prolip_step())
    section("Train augmentation (256 x 439^2 -> 224^2, crop+flip+rotate)",
            bench_augmentation())
    section("Tokenizer (descriptive CS prompt set)", bench_tokenizer())

    Path(out_path).write_text("\n".join(lines))
    print(f"[bench] -> {out_path}")


if __name__ == "__main__":
    main()
