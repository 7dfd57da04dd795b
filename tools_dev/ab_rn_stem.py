"""RN50 stem A/B: the 3-conv stem is 6.1 ms = 22% of the step for
0.7 GF/img (BENCHMARKS.md "ModifiedResNet encode", r4) — 3->32->32->64
channels cannot fill the MXU contraction dim through XLA's conv
lowering.  r5 (VERDICT item 6): isolate WHICH stem op burns the time,
then A/B reformulations.

--components: cumulative ladder preprocess / conv1 / conv2 / conv3 /
avgpool (chained fori_loop, differenced).

Arms (whole-stem, each parity-checked vs xla before timing):
  xla     canonical: three lax.conv NHWC + folded-BN relu + avgpool
  p27     conv1 as an overlapping-patch GEMM: nine strided slices of the
          224px input concatenated channel-wise -> [B, 112, 112, 27],
          then a K=27 matmul (the PatchEmbed matmul trick, overlapping
          stride-2 edition); conv2/conv3 stay XLA
  s2d     conv1 via space-to-depth: x -> [B, 112, 112, 12] (2x2 blocks),
          the stride-2 3x3 becomes a stride-1 2x2 conv at C_in=12 (the
          taps scatter into a [2, 2, 12, 32] kernel — exact)
  nchw    the whole stem on an NCHW-resident activation
  allmat  conv1 via p27 AND conv2/conv3 as 9-shift accumulated GEMMs
          (out += shift(x) @ W[dy, dx], K=32 each — no im2col tensor)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools_dev/ab_rn_stem.py \
           [--batch 256] [--components] [--arms xla,p27,s2d] [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="RN50")
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--components", action="store_true")
    p.add_argument("--arms", default="xla,p27,s2d,nchw,allmat")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (parity smoke without "
                        "touching the TPU)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.fast_resnet import _avg_pool, _conv, \
        fold_resnet_bn
    from aihab_clip_tpu.ops.preprocess import eval_transform
    from aihab_clip_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log(f"device: {jax.devices()[0]}")
    bundle = load(f"random:{args.model}", dtype=jnp.bfloat16,
                  param_dtype=jnp.bfloat16, seed=0)
    params, config = bundle.params, bundle.config
    res = config.image_resolution
    folded = fold_resnet_bn(params["visual"], dtype=jnp.bfloat16)
    bs = args.batch
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(bs, res, res, 3),
                                    dtype=np.uint8))

    def stem_xla(fv, x):
        x = jax.nn.relu(_conv(x, fv["conv1"], stride=2, pad=1))
        x = jax.nn.relu(_conv(x, fv["conv2"], pad=1))
        x = jax.nn.relu(_conv(x, fv["conv3"], pad=1))
        return _avg_pool(x, 2)

    if args.components:
        def run_to(fv, images_u8, upto: int):
            x = eval_transform(images_u8, res, dtype=jnp.bfloat16)
            if upto >= 1:
                x = jax.nn.relu(_conv(x, fv["conv1"], stride=2, pad=1))
            if upto >= 2:
                x = jax.nn.relu(_conv(x, fv["conv2"], pad=1))
            if upto >= 3:
                x = jax.nn.relu(_conv(x, fv["conv3"], pad=1))
            if upto >= 4:
                x = _avg_pool(x, 2)
            return jnp.sum(x.astype(jnp.float32))

        @partial(jax.jit, static_argnames=("n", "upto"))
        def bench_n(fv, images_u8, n, upto):
            def body(i, acc):
                return acc + run_to(fv, images_u8 ^ i.astype(jnp.uint8),
                                    upto)
            return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

        names = ["preprocess", "conv1", "conv2", "conv3", "avgpool"]
        times = []
        for upto in range(5):
            float(bench_n(folded, imgs, 2, upto))
            float(bench_n(folded, imgs, 2 + args.iters, upto))
            t0 = time.perf_counter()
            float(bench_n(folded, imgs, 2 + args.iters, upto))
            t_long = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(bench_n(folded, imgs, 2, upto))
            t_short = time.perf_counter() - t0
            times.append((t_long - t_short) / args.iters * 1e3)
            delta = times[-1] - (times[-2] if upto else 0.0)
            print(f"  through {names[upto]}: {times[-1]:.2f} ms "
                  f"(+{delta:.2f})", flush=True)
        return

    # ---- whole-stem arms ------------------------------------------------
    def conv1_p27(fv, x):
        """stride-2 3x3 C_in=3 as a K=27 GEMM on stacked strided slices."""
        b, h, w, c = x.shape
        ho, wo = h // 2, w // 2
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = []
        for dy in range(3):
            for dx in range(3):
                cols.append(jax.lax.slice(
                    xp, (0, dy, dx, 0), (b, dy + h, dx + w, c), (1, 2, 2, 1)))
        patches = jnp.concatenate(cols, axis=-1)        # [B, 112, 112, 27]
        k = fv["conv1"]["kernel"]                       # [3, 3, 3, 32]
        kmat = k.reshape(9 * 3, -1).astype(x.dtype)
        # slice order (dy, dx) majors the kernel's HW dims; channel minor
        # within each tap matches reshape(9*3, -1) exactly
        out = patches.reshape(b * ho * wo, 9 * c) @ kmat
        out = out + fv["conv1"]["bias"].astype(x.dtype)
        return out.reshape(b, ho, wo, -1)

    def conv1_s2d(fv, x):
        """stride-2 3x3 as a stride-1 2x2 conv on the 2x2-block s2d input.
        Output pixel (i, j) reads input rows {2i-1, 2i, 2i+1}: with one
        leading zero row/col the padded input has rows {2i, 2i+1, 2i+2},
        i.e. s2d block rows {i, i+1} — a 2x2 window.  Tap (dy, dx) of the
        original kernel lands at s2d block (floor((dy+1)/2), ...) phase
        ((dy+1)%2, ...)."""
        b, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))   # 224 -> 226
        hp = xp.shape[1] // 2                                # 113 blocks
        s2d = xp.reshape(b, hp, 2, xp.shape[2] // 2, 2, c)
        s2d = s2d.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, hp, xp.shape[2] // 2, 4 * c)                  # [B,113,113,12]
        k = fv["conv1"]["kernel"]                            # [3,3,3,32]
        # padded input row for out pixel i, tap dy is 2i+dy -> s2d block
        # row i + dy//2, phase dy%2 (same in columns)
        k2 = jnp.zeros((2, 2, 2, 2, c, k.shape[-1]), k.dtype)
        for dy in range(3):
            for dx in range(3):
                by, py = dy // 2, dy % 2
                bx, px = dx // 2, dx % 2
                k2 = k2.at[by, bx, py, px].set(k[dy, dx])
        # s2d channel order is (phase_y, phase_x, c) — k2 dims [by, bx,
        # py, px, c, co] flatten to HWIO in exactly that order
        k2 = k2.reshape(2, 2, 4 * c, k.shape[-1])
        out = jax.lax.conv_general_dilated(
            s2d, k2.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + fv["conv1"]["bias"].astype(x.dtype)

    def conv_9shift(x, kern, bias):
        """3x3 pad-1 dense conv as 9 accumulated K=C_in GEMMs on shifted
        slices (no im2col tensor; XLA fuses the slice into the dot or
        not — that is what we measure)."""
        b, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        co = kern.shape[-1]
        acc = jnp.zeros((b, h, w, co), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = jax.lax.slice(xp, (0, dy, dx, 0),
                                   (b, dy + h, dx + w, c))
                acc = acc + jax.lax.dot_general(
                    sl, kern[dy, dx].astype(x.dtype),
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        return (acc + bias.astype(jnp.float32)).astype(x.dtype)

    def stem_p27(fv, x):
        y = jax.nn.relu(conv1_p27(fv, x))
        y = jax.nn.relu(_conv(y, fv["conv2"], pad=1))
        y = jax.nn.relu(_conv(y, fv["conv3"], pad=1))
        return _avg_pool(y, 2)

    def stem_s2d(fv, x):
        y = jax.nn.relu(conv1_s2d(fv, x))
        y = jax.nn.relu(_conv(y, fv["conv2"], pad=1))
        y = jax.nn.relu(_conv(y, fv["conv3"], pad=1))
        return _avg_pool(y, 2)

    def stem_allmat(fv, x):
        y = jax.nn.relu(conv1_p27(fv, x))
        y = jax.nn.relu(conv_9shift(y, fv["conv2"]["kernel"],
                                    fv["conv2"]["bias"]))
        y = jax.nn.relu(conv_9shift(y, fv["conv3"]["kernel"],
                                    fv["conv3"]["bias"]))
        return _avg_pool(y, 2)

    def stem_nchw(fv, x):
        xc = jnp.transpose(x, (0, 3, 1, 2))

        def cv(xx, p, stride=1):
            return jax.lax.conv_general_dilated(
                xx, p["kernel"].astype(xx.dtype), (stride, stride),
                [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "HWIO", "NCHW")) \
                + p["bias"].astype(xx.dtype)[None, :, None, None]

        y = jax.nn.relu(cv(xc, fv["conv1"], 2))
        y = jax.nn.relu(cv(y, fv["conv2"]))
        y = jax.nn.relu(cv(y, fv["conv3"]))
        b, c, h, w = y.shape
        y = y.reshape(b, c, h // 2, 2, w // 2, 2).mean((3, 5))
        return jnp.transpose(y, (0, 2, 3, 1))

    stems = {"xla": stem_xla, "p27": stem_p27, "s2d": stem_s2d,
             "nchw": stem_nchw, "allmat": stem_allmat}

    x0 = jax.jit(lambda u: eval_transform(u, res, dtype=jnp.bfloat16))(imgs)
    ref = np.asarray(jax.jit(lambda fv, x: stem_xla(fv, x))(folded, x0)
                     .astype(jnp.float32))
    scale = np.abs(ref).max()

    @partial(jax.jit, static_argnames=("n", "arm"))
    def bench_n(fv, images_u8, n, arm):
        fn = stems[arm]

        def body(i, acc):
            x = eval_transform(images_u8 ^ i.astype(jnp.uint8), res,
                               dtype=jnp.bfloat16)
            return acc + jnp.sum(fn(fv, x).astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    arm_list = args.arms.split(",")
    if "xla" in arm_list:                       # A/B/A control
        arm_list = arm_list + ["xla"]
    for arm in arm_list:
        got = np.asarray(jax.jit(
            lambda fv, x, a=arm: stems[a](fv, x))(folded, x0)
            .astype(jnp.float32))
        err = np.abs(got - ref).max() / scale
        if err > 0.05:
            print(f"  {arm}: PARITY FAIL rel|d|={err:.3f}", flush=True)
            continue
        log(f"  {arm} parity rel|d|={err:.2e}")
        try:
            t0 = time.perf_counter()
            float(bench_n(folded, imgs, 2, arm))
            log(f"  {arm}: short compile+run {time.perf_counter() - t0:.0f}s")
            float(bench_n(folded, imgs, 2 + args.iters, arm))
            t0 = time.perf_counter()
            float(bench_n(folded, imgs, 2 + args.iters, arm))
            t_long = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(bench_n(folded, imgs, 2, arm))
            t_short = time.perf_counter() - t0
            ms = (t_long - t_short) / args.iters * 1e3
            print(f"  {arm}: {ms:.2f} ms/stem-iter (b{bs})", flush=True)
        except Exception as e:
            print(f"  {arm}: FAILED ({type(e).__name__}: {str(e)[:120]})",
                  flush=True)


if __name__ == "__main__":
    main()
