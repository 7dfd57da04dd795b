"""Isolate the canonical SO400M train-graph pathology (PERF_NOTES.md:
456 ms/step at b16@384 vs ~125 ms predicted from a 50%-MFU fwd+bwd
composition; the frozen-prefix hybrid runs 76.7 ms).

The canonical and hybrid PEFT arms share the trainable-suffix math
(`_canonical_siglip_block`) and differ ONLY in the embed + frozen-prefix
forward (module `nn.Conv` + XLA blocks vs matmul patchify + fused Pallas
blocks), so ~380 ms hides in a 17-block FORWARD that should cost ~50 ms.
This tool times each candidate in isolation (chained fori_loop, scalar
fetch — the axon tunnel executes lazily):

  embed-conv / embed-matmul        nn.Conv vs reshape+matmul patchify, fwd
  fwd-module / fwd-purefn / fwd-fused
                                   full 27-block tower forward: Flax
                                   module vs plain-jnp canonical blocks
                                   vs whole-block Pallas kernels
  sufgrad-module / sufgrad-purefn  grad wrt the top-10-block suffix
                                   (unlocked_groups=11) through either
                                   forward — the A/B's step sans Adam/aug
  sufgrad-*-xlaattn                same, FUSED_MIN_SEQ raised so the
                                   suffix attention takes the plain XLA
                                   path instead of the fused custom VJP
                                   (Pallas forward + Pallas backward
                                   kernel; before ops/attention.py grew
                                   the backward kernel this was Pallas
                                   forward + recompute-XLA-backward)
  attn                             one attention op at tower shape:
                                   fwd and fwd+grad, fused vs XLA —
                                   isolates the fused-VJP cost

Usage: PYTHONPATH=/root/.axon_site:. python tools_dev/diag_siglip_train.py \
           [--only embed,fwd,sufgrad,attn] [--batch 16]
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_chain(fn, n_short=2, n_long=6, label=""):
    """fn(n) -> scalar float, chaining n iterations on device."""
    t0 = time.perf_counter()
    fn(n_short)
    log(f"  {label}: compile+run {time.perf_counter() - t0:.0f}s")
    fn(n_long)
    t0 = time.perf_counter()
    fn(n_short)
    ts = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn(n_long)
    tl = time.perf_counter() - t0
    ms = (tl - ts) / (n_long - n_short) * 1e3
    log(f"  {label}: {ms:.1f} ms/iter")
    return round(ms, 2)


def main():
    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.fast_siglip import (
        _canonical_siglip_block,
        _map_pool,
        _siglip_embed,
        canonical_blocks_scan,
        siglip_encode_fast,
        stack_block_params,
    )
    from aihab_clip_tpu.models.siglip import SigLIPVisionTower

    argv = sys.argv[1:]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    bs = 16
    if "--batch" in argv:
        i = argv.index("--batch")
        bs = int(argv[i + 1])
        del argv[i:i + 2]
    model_name = "random:ViT-SO400M-16-SigLIP2-384"
    if "--model" in argv:  # e.g. random:SigLIP-Tiny for a CPU smoke
        i = argv.index("--model")
        model_name = argv[i + 1]
        del argv[i:i + 2]

    def want(group):
        return only is None or group in only

    dev = jax.devices()[0]
    log(f"device: {dev}")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        bundle = load(model_name, seed=0, dtype=jnp.bfloat16)
    config = bundle.config
    vp = jax.device_put(bundle.params["visual"], dev)
    del bundle

    res = config.image_resolution
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((bs, res, res, 3)).astype(
        np.float32)).astype(jnp.bfloat16)
    x0 = jax.device_put(x0, dev)

    tower = SigLIPVisionTower(config, dtype=jnp.bfloat16,
                              param_dtype=jnp.float32)
    # stem ablation arm: the module tower with the old nn.Conv-style stem
    # (the default module stem is now the matmul patchify)
    tower_conv = SigLIPVisionTower(config, dtype=jnp.bfloat16,
                                   param_dtype=jnp.float32, patchify="conv")

    def vary(x, i):
        return x + (i.astype(jnp.bfloat16) * 1e-3)

    def chain(body):
        @partial(jax.jit, static_argnames=("n",))
        def run(vp, x, n):
            def step(i, acc):
                return acc + body(vp, vary(x, i))
            return jax.lax.fori_loop(0, n, step, jnp.zeros((), jnp.float32))
        return lambda n: float(run(vp, x0, n))

    results = {}

    # --- embed: nn.Conv vs matmul patchify (forward only) ---------------
    if want("embed"):
        # the tower has no embed-only method; time the conv primitive the
        # way nn.Conv lowers it (same dimension_numbers / dtypes); weights
        # read from the vp ARGUMENT — closing over them would bake them
        # into the compile payload and let XLA constant-fold the conv arm
        p = config.patch_size

        def conv_embed(vp, x):
            y = jax.lax.conv_general_dilated(
                x, jnp.asarray(vp["conv1"]["kernel"], jnp.bfloat16),
                (p, p), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(
                (y + jnp.asarray(vp["conv1"]["bias"], jnp.bfloat16))
                .astype(jnp.float32))

        def matmul_embed(vp, x):
            y = _siglip_embed(vp, x, config, jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32))

        results["embed-conv"] = timed_chain(chain(conv_embed),
                                            label="embed-conv")
        results["embed-matmul"] = timed_chain(chain(matmul_embed),
                                              label="embed-matmul")

    # --- full-tower forward: module vs pure-fn vs fused ------------------
    def purefn_encode(vp, x):
        h = _siglip_embed(vp, x, config, jnp.bfloat16)
        for i in range(config.vision_layers):
            h = _canonical_siglip_block(
                h, vp["transformer"][f"resblocks_{i}"],
                config.vision_heads, jnp.bfloat16)
        return _map_pool(vp, h, config, jnp.bfloat16)

    if want("fwd"):
        def fwd_module(vp, x):
            pooled = tower.apply({"params": vp}, x)
            return jnp.sum(pooled.astype(jnp.float32))

        def fwd_module_conv(vp, x):
            pooled = tower_conv.apply({"params": vp}, x)
            return jnp.sum(pooled.astype(jnp.float32))

        def fwd_purefn(vp, x):
            return jnp.sum(purefn_encode(vp, x).astype(jnp.float32))

        def fwd_fused(vp, x):
            pooled = siglip_encode_fast({"visual": vp}, x, config)
            return jnp.sum(pooled.astype(jnp.float32))

        results["fwd-module"] = timed_chain(chain(fwd_module),
                                            label="fwd-module")
        results["fwd-module-conv"] = timed_chain(chain(fwd_module_conv),
                                                 label="fwd-module-conv")
        results["fwd-purefn"] = timed_chain(chain(fwd_purefn),
                                            label="fwd-purefn")
        if dev.platform == "tpu":  # Pallas kernels
            results["fwd-fused"] = timed_chain(chain(fwd_fused),
                                               label="fwd-fused")

        # scan-over-blocks: same math, ONE block body in the compiled
        # program instead of 27 — isolates unrolled-graph scheduling.
        # stacked params ride as a jit ARGUMENT (closure would bake ~GBs
        # into the compile payload)
        stacked_all = stack_block_params(vp, 0, config.vision_layers)

        def fwd_scan(vp, stacked, x):
            h = _siglip_embed(vp, x, config, jnp.bfloat16)
            h = canonical_blocks_scan(h, stacked, config.vision_heads,
                                      jnp.bfloat16)
            return jnp.sum(
                _map_pool(vp, h, config, jnp.bfloat16).astype(jnp.float32))

        @partial(jax.jit, static_argnames=("n",))
        def run_scan(vp, stacked, x, n):
            def step(i, acc):
                return acc + fwd_scan(vp, stacked, vary(x, i))
            return jax.lax.fori_loop(0, n, step, jnp.zeros((), jnp.float32))

        results["fwd-scan"] = timed_chain(
            lambda n: float(run_scan(vp, stacked_all, x0, n)),
            label="fwd-scan")

    # --- suffix-grad (the PEFT step sans Adam/aug/text) ------------------
    if want("sufgrad"):
        # unlocked_groups=11 -> top 10 blocks + head trainable (SO400M: 17)
        n_prefix = max(1, config.vision_layers - 10)
        suffix_keys = ([f"resblocks_{i}" for i in
                        range(n_prefix, config.vision_layers)])

        def split(vp):
            trainable = {"transformer": {k: vp["transformer"][k]
                                         for k in suffix_keys},
                         "attnpool": vp["attnpool"],
                         "ln_post": vp["ln_post"]}
            return trainable

        def merge(vp, trainable):
            merged = dict(vp)
            merged["transformer"] = dict(vp["transformer"])
            for k in suffix_keys:
                merged["transformer"][k] = trainable["transformer"][k]
            merged["attnpool"] = trainable["attnpool"]
            merged["ln_post"] = trainable["ln_post"]
            return merged

        def make_sufgrad(encode):
            def body(vp, x):
                trainable = split(vp)

                def loss(tr):
                    pooled = encode(merge(vp, tr), x)
                    return jnp.sum(jnp.square(pooled.astype(jnp.float32)))

                l, g = jax.value_and_grad(loss)(trainable)
                gleaf = g["transformer"][suffix_keys[0]]["mlp"]["c_fc"][
                    "kernel"]
                return l + jnp.sum(gleaf.astype(jnp.float32)) * 0.0
            return body

        def module_encode(vpm, x):
            return tower.apply({"params": vpm}, x)

        def module_conv_encode(vpm, x):
            return tower_conv.apply({"params": vpm}, x)

        results["sufgrad-module"] = timed_chain(
            chain(make_sufgrad(module_encode)), label="sufgrad-module")
        results["sufgrad-module-conv"] = timed_chain(
            chain(make_sufgrad(module_conv_encode)),
            label="sufgrad-module-conv")
        results["sufgrad-purefn"] = timed_chain(
            chain(make_sufgrad(purefn_encode)), label="sufgrad-purefn")

        # scan both regions: frozen prefix scanned without grads, the
        # trainable suffix scanned as the diff'd (stacked) argument
        stacked_pre = stack_block_params(vp, 0, n_prefix)
        stacked_suf = stack_block_params(vp, n_prefix, config.vision_layers)

        def sufgrad_scan(vp, pre, suf, x):
            def loss(diff):
                sufp, pool = diff
                h = _siglip_embed(vp, x, config, jnp.bfloat16)
                h = canonical_blocks_scan(h, pre, config.vision_heads,
                                          jnp.bfloat16)
                h = canonical_blocks_scan(h, sufp, config.vision_heads,
                                          jnp.bfloat16)
                vpm = dict(vp)
                vpm["attnpool"] = pool["attnpool"]
                vpm["ln_post"] = pool["ln_post"]
                pooled = _map_pool(vpm, h, config, jnp.bfloat16)
                return jnp.sum(jnp.square(pooled.astype(jnp.float32)))

            diff = (suf, {"attnpool": vp["attnpool"],
                          "ln_post": vp["ln_post"]})
            l, g = jax.value_and_grad(loss)(diff)
            gleaf = g[0]["mlp"]["c_fc"]["kernel"]
            return l + jnp.sum(gleaf.astype(jnp.float32)) * 0.0

        @partial(jax.jit, static_argnames=("n",))
        def run_sufscan(vp, pre, suf, x, n):
            def step(i, acc):
                return acc + sufgrad_scan(vp, pre, suf, vary(x, i))
            return jax.lax.fori_loop(0, n, step, jnp.zeros((), jnp.float32))

        results["sufgrad-scan"] = timed_chain(
            lambda n: float(run_sufscan(vp, stacked_pre, stacked_suf, x0, n)),
            label="sufgrad-scan")

        # ablate the attention impl: FUSED_MIN_SEQ raised past S forces
        # the plain-XLA dispatch at trace time (each timed_chain call
        # builds a fresh jit, so the flag takes effect per arm)
        from aihab_clip_tpu.ops import attention as attn_mod

        old_min_seq = attn_mod.FUSED_MIN_SEQ
        attn_mod.FUSED_MIN_SEQ = 1 << 30
        try:
            results["sufgrad-module-xlaattn"] = timed_chain(
                chain(make_sufgrad(module_encode)),
                label="sufgrad-module-xlaattn")
            results["sufgrad-purefn-xlaattn"] = timed_chain(
                chain(make_sufgrad(purefn_encode)),
                label="sufgrad-purefn-xlaattn")
        finally:
            attn_mod.FUSED_MIN_SEQ = old_min_seq

    # --- one attention op, fwd and fwd+grad, fused vs XLA ----------------
    if want("attn"):
        from aihab_clip_tpu.ops.attention import attention

        s = (res // config.patch_size) ** 2
        w = config.vision_width
        heads = config.vision_heads
        qkv0 = jnp.asarray(
            rng.standard_normal((3, bs, s, w)).astype(np.float32)
        ).astype(jnp.bfloat16)
        qkv0 = jax.device_put(qkv0, dev)

        def attn_chain(body):
            @partial(jax.jit, static_argnames=("n",))
            def run(qkv, n):
                def step(i, acc):
                    return acc + body(vary(qkv, i))
                return jax.lax.fori_loop(0, n, step,
                                         jnp.zeros((), jnp.float32))
            return lambda n: float(run(qkv0, n))

        def make_fwd(use_fused):
            def body(qkv):
                o = attention(qkv[0], qkv[1], qkv[2], heads,
                              use_fused=use_fused)
                return jnp.sum(o.astype(jnp.float32))
            return body

        def make_grad(use_fused):
            def body(qkv):
                def loss(t):
                    o = attention(t[0], t[1], t[2], heads,
                                  use_fused=use_fused)
                    return jnp.sum(jnp.square(o.astype(jnp.float32)))
                l, g = jax.value_and_grad(loss)(qkv)
                return l + jnp.sum(g[0].astype(jnp.float32)) * 0.0
            return body

        on_tpu = dev.platform == "tpu"
        if on_tpu:
            results["attn-fwd-fused"] = timed_chain(
                attn_chain(make_fwd(True)), label="attn-fwd-fused")
        results["attn-fwd-xla"] = timed_chain(
            attn_chain(make_fwd(False)), label="attn-fwd-xla")
        if on_tpu:
            results["attn-grad-fused"] = timed_chain(
                attn_chain(make_grad(True)), label="attn-grad-fused")
        results["attn-grad-xla"] = timed_chain(
            attn_chain(make_grad(False)), label="attn-grad-xla")

    log(f"batch {bs}; S={(res // config.patch_size) ** 2}; "
        f"W={config.vision_width}; layers={config.vision_layers}")
    print(results)


if __name__ == "__main__":
    main()
