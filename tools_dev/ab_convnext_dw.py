"""A/B the ConvNeXt depthwise-7x7 lowering at each stage shape (r4).

VERDICT r3 item 1: the family's remaining time after the fused MLP
kernels is ~25 ms of depthwise conv at b128 (stage 2 alone: 27 blocks x
0.70 ms for 1.6 GF each — ~8x off the HBM traffic bound through XLA's
depthwise lowering).  Arms (each a stack of ``--reps`` layers with
DISTINCT weights, so per-layer weight traffic is realistic):

  xla     conv_general_dilated NHWC feature_group_count=C (current)
  nchw    the same conv on an NCHW-resident activation (layout A/B;
          assumes a whole-stage layout change — measures the conv only)
  mat     banded-matrix matmul: out[b,t,c] = sum_s x[b,s,c] * A[c,t,s]
          with A [C, S, S] prebuilt from the 7x7 kernel at load time
          (exact math incl. zero-pad edges).  Turns the contraction-free
          depthwise op into a c-batched [B,S]x[S,S] MXU GEMM; only
          sensible where S = H*W is small (stage 2: 256, stage 3: 64).
  shift   sum of 49 statically-shifted multiplies on a padded buffer
          (pure XLA elementwise — tests whether XLA fuses the taps)
  blockmat  r5: BLOCK-banded A.  With the 3-row zero pad made explicit
          on x, the banded matrix is TRANSLATION-INVARIANT across
          output-row blocks: ONE shared A [C, (Rb+6)*sp, Rb*sp] serves
          every block of Rb output rows (vs the dense [C, S, S] —
          stage2@320: 16 MB vs 164 MB, the exact traffic that made the
          dense form LOSE there, PERF_NOTES r4).  x is restacked into
          overlapping row windows [B, P, (Rb+6)*sp, C] ((Rb+6)/Rb x
          activation traffic) and the whole thing is one batched einsum.
  blockslc  same A, but per-block einsums on slices of x_pad (no
          materialized window stack — probes whether XLA fuses the
          overlapping slices into the GEMM reads).

Each arm checks parity vs the `xla` arm before timing.  Chained
fori_loop methodology (DEV_NOTES.md).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools_dev/ab_convnext_dw.py \
           [--batch 128] [--stages 2,3] [--arms xla,mat,shift] [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_dw_matrix(kernel: np.ndarray, sp: int) -> np.ndarray:
    """[7,7,1,C] HWIO depthwise kernel -> banded A [C, S, S] (S = sp*sp)
    with SAME zero padding encoded in the band structure (edge rows simply
    have fewer taps) — exact, no approximation."""
    k = np.asarray(kernel, np.float32)[:, :, 0, :]          # [7, 7, C]
    kh, kw, c = k.shape
    s = sp * sp
    a = np.zeros((c, s, s), np.float32)
    oi, oj = np.meshgrid(np.arange(sp), np.arange(sp), indexing="ij")
    t_flat = oi * sp + oj
    for dy in range(kh):
        for dx in range(kw):
            ii = oi + dy - kh // 2
            jj = oj + dx - kw // 2
            m = (ii >= 0) & (ii < sp) & (jj >= 0) & (jj < sp)
            t = t_flat[m]
            src = (ii * sp + jj)[m]
            a[:, t, src] = k[dy, dx][:, None]
    return a


def build_dw_block_matrix(kernel: np.ndarray, sp: int, rb: int) -> np.ndarray:
    """[7,7,1,C] HWIO depthwise kernel -> SHARED block-banded A
    [C, (rb+6)*sp, rb*sp].  Callers pad x with 3 zero rows top+bottom;
    block p of rb output rows then reads padded input rows
    [p*rb, p*rb + rb + 6) and A is identical for every p (translation
    invariance in the row index).  Column zero padding stays encoded in
    the band structure (edge columns have fewer taps) — exact math."""
    k = np.asarray(kernel, np.float32)[:, :, 0, :]          # [7, 7, C]
    kh, kw, c = k.shape
    a = np.zeros((c, (rb + kh - 1) * sp, rb * sp), np.float32)
    for r_o in range(rb):
        for dy in range(kh):
            r_i = r_o + dy
            for j_o in range(sp):
                for dx in range(kw):
                    j_i = j_o + dx - kw // 2
                    if 0 <= j_i < sp:
                        a[:, r_i * sp + j_i, r_o * sp + j_o] = k[dy, dx]
    return a


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--stages", default="0,1,2,3")
    p.add_argument("--arms", default="xla,mat,shift")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--reps", type=int, default=8,
                   help="distinct dw layers per timed stack")
    p.add_argument("--rb", type=int, default=4,
                   help="output rows per block for the blockmat arms")
    args = p.parse_args()

    from aihab_clip_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log(f"device: {jax.devices()[0]}")

    rng = np.random.default_rng(0)
    reps = args.reps

    def timed(stack_fn, weights, x, label):
        """stack_fn(weights, x) applies `reps` layers; chained via
        fori_loop.  Weights are jit ARGUMENTS, not closure constants —
        closing over the 67 MB banded matrices oversizes the remote
        compile payload (HTTP 413; CLAUDE.md donation/closure rule)."""
        def loop(weights, x, n):
            out = jax.lax.fori_loop(
                0, n, lambda i, xx: stack_fn(weights, xx), x)
            return jnp.sum(out.astype(jnp.float32))

        j = jax.jit(loop, static_argnames="n")
        float(j(weights, x, 2))
        float(j(weights, x, 2 + args.iters))
        t0 = time.perf_counter(); float(j(weights, x, 2))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter(); float(j(weights, x, 2 + args.iters))
        t_long = time.perf_counter() - t0
        ms = (t_long - t_short) / args.iters / reps * 1e3
        print(f"  {label}: {ms:.3f} ms/layer", flush=True)
        return ms

    for s in map(int, args.stages.split(",")):
        dim = args.width * 2 ** s
        sp = args.res // 4 // 2 ** s
        ss = sp * sp
        x = jnp.asarray(rng.standard_normal((args.batch, sp, sp, dim)),
                        jnp.bfloat16)
        kerns = [rng.standard_normal((7, 7, 1, dim)).astype(np.float32) * 0.2
                 for _ in range(reps)]
        biases = [rng.standard_normal((dim,)).astype(np.float32) * 0.01
                  for _ in range(reps)]
        kerns_j = [jnp.asarray(k, jnp.bfloat16) for k in kerns]
        biases_j = [jnp.asarray(b, jnp.bfloat16) for b in biases]
        gf = args.batch * ss * dim * 49 * 2 / 1e9
        print(f"stage{s} b{args.batch} {sp}x{sp}x{dim} ({gf:.2f} GF/layer):",
              flush=True)

        def dw1_xla(xx, k, b):
            return jax.lax.conv_general_dilated(
                xx, k.astype(xx.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=dim) + b

        def stack_xla(weights, xx):
            for k, b in weights:
                xx = dw1_xla(xx, k, b)
            return xx

        w_xla = list(zip(kerns_j, biases_j))

        ref1 = np.asarray(
            jax.jit(lambda xx: dw1_xla(xx, kerns_j[0], biases_j[0]))(x)
            .astype(jnp.float32))

        arms = {"xla": (stack_xla, w_xla)}

        if "nchw" in args.arms:
            xc = jnp.transpose(x, (0, 3, 1, 2))

            def dw1_nchw(xx, k, b):
                return jax.lax.conv_general_dilated(
                    xx, k.astype(xx.dtype), (1, 1), "SAME",
                    dimension_numbers=("NCHW", "HWIO", "NCHW"),
                    feature_group_count=dim) + b[None, :, None, None]

            def stack_nchw(weights, xx):
                for k, b in weights:
                    xx = dw1_nchw(xx, k, b)
                return xx

            got = np.asarray(jnp.transpose(
                jax.jit(lambda xx: dw1_nchw(xx, kerns_j[0], biases_j[0]))(xc),
                (0, 2, 3, 1)).astype(jnp.float32))
            log(f"  nchw parity max|d|={np.abs(got - ref1).max():.2e}")
            timed(stack_nchw, w_xla, xc, "nchw (NCHW-resident)")

        # the 537 MB stage-1 dense A (s=1024) oversizes even the ARG
        # payload of the remote compile (HTTP 413) — cap the arm at
        # shapes whose A stack ships
        if "mat" in args.arms and ss <= 1200 \
                and dim * ss * ss * 2 <= 256 * 2 ** 20:
            amats = [jnp.asarray(build_dw_matrix(k, sp), jnp.bfloat16)
                     for k in kerns]
            log(f"  A matrices: {reps} x {amats[0].size * 2 / 1e6:.0f} MB "
                "bf16")

            def dw1_mat(xx, a, b):
                b_ = xx.shape[0]
                flat = xx.reshape(b_, ss, dim)
                out = jnp.einsum("bsc,cts->btc", flat, a)
                return (out + b).reshape(b_, sp, sp, dim)

            def stack_mat(weights, xx):
                for a, b in weights:
                    xx = dw1_mat(xx, a, b)
                return xx

            got = np.asarray(
                jax.jit(lambda xx: dw1_mat(xx, amats[0], biases_j[0]))(x)
                .astype(jnp.float32))
            err = np.abs(got - ref1).max()
            log(f"  mat parity max|d|={err:.2e} (ref max "
                f"{np.abs(ref1).max():.1f})")
            arms["mat"] = (stack_mat, list(zip(amats, biases_j)))

        rb = args.rb
        if ("blockmat" in args.arms or "blockslc" in args.arms) \
                and sp % rb == 0:
            nblk = sp // rb
            bmats = [jnp.asarray(build_dw_block_matrix(k, sp, rb),
                                 jnp.bfloat16) for k in kerns]
            log(f"  shared block A: {reps} x {bmats[0].size * 2 / 1e6:.1f}"
                f" MB bf16 (rb={rb}, {nblk} blocks; dense would be "
                f"{dim * ss * ss * 2 / 1e6:.0f} MB)")

            def dw1_bmat(xx, a, b):
                b_ = xx.shape[0]
                xp = jnp.pad(xx, ((0, 0), (3, 3), (0, 0), (0, 0)))
                win = jnp.stack(
                    [xp[:, p * rb:p * rb + rb + 6] for p in range(nblk)],
                    axis=1)                      # [B, P, rb+6, sp, C]
                win = win.reshape(b_, nblk, (rb + 6) * sp, dim)
                out = jnp.einsum("bpic,cit->bptc", win, a)
                return (out.reshape(b_, sp, sp, dim) + b)

            def dw1_bslc(xx, a, b):
                b_ = xx.shape[0]
                xp = jnp.pad(xx, ((0, 0), (3, 3), (0, 0), (0, 0)))
                outs = []
                for p_ in range(nblk):
                    w = xp[:, p_ * rb:p_ * rb + rb + 6].reshape(
                        b_, (rb + 6) * sp, dim)
                    outs.append(jnp.einsum("bic,cit->btc", w, a))
                out = jnp.concatenate(outs, axis=1)
                return (out.reshape(b_, sp, sp, dim) + b)

            for name, f1 in (("blockmat", dw1_bmat), ("blockslc", dw1_bslc)):
                if name not in args.arms:
                    continue
                got = np.asarray(
                    jax.jit(lambda xx, f1=f1: f1(xx, bmats[0], biases_j[0]))(x)
                    .astype(jnp.float32))
                log(f"  {name} parity max|d|={np.abs(got - ref1).max():.2e}")

                def stack(weights, xx, f1=f1):
                    for a, b in weights:
                        xx = f1(xx, a, b)
                    return xx

                arms[name] = (stack, list(zip(bmats, biases_j)))

        if "shift" in args.arms:

            def dw1_shift(xx, k, b):
                pad = jnp.pad(xx, ((0, 0), (3, 3), (3, 3), (0, 0)))
                acc = jnp.zeros_like(xx, dtype=jnp.float32)
                for dy in range(7):
                    for dx in range(7):
                        acc = acc + (
                            pad[:, dy:dy + sp, dx:dx + sp, :]
                            .astype(jnp.float32)
                            * k[dy, dx, 0].astype(jnp.float32))
                return acc.astype(xx.dtype) + b

            def stack_shift(weights, xx):
                for k, b in weights:
                    xx = dw1_shift(xx, k, b)
                return xx

            got = np.asarray(
                jax.jit(lambda xx: dw1_shift(xx, kerns_j[0], biases_j[0]))(x)
                .astype(jnp.float32))
            log(f"  shift parity max|d|={np.abs(got - ref1).max():.2e}")
            arms["shift"] = (stack_shift, w_xla)

        for label in args.arms.split(","):
            if label == "nchw":
                continue  # timed above (different resident layout)
            if label in arms:
                fn, w = arms[label]
                timed(fn, w, x, label)
        if len(arms) > 1:
            fn, w = arms["xla"]
            timed(fn, w, x, "xla (control)")


if __name__ == "__main__":
    main()
