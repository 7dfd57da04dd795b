"""Bisect the SO400M scan_blocks remote-compile crash (ROADMAP item).

Known state (PERF_NOTES "SO400M FULL train step"): `scan_blocks: true`
compiles AND step-matches at the image-only SO400M config, but the full
reference-default step (tune_text ON, unlocked_groups=11, Adam + aug,
b16@384) crashes the remote Mosaic/XLA compiler (HTTP 500, helper exit 1).

This tool COMPILES (never runs) `make_epoch_scan` across a ladder of
configs that add one ingredient at a time, so the crash can be pinned to
an ingredient (or to graph size) and re-probed in one command on
toolchain updates:

    arm 1: scan, image-only (tune_text off)            -- known good (r1)
    arm 2: scan, tune_text, TEXT scan suppressed       -- isolates the
           scanned text tower (vision still scans)
    arm 3: scan, tune_text, half-depth vision tower    -- graph-size probe
    arm 4: scan, tune_text, full config                -- known crash (r2)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH timeout 3000 \
           python tools_dev/repro_scan_crash.py [--arms 1,2,3,4] [--tiny]
"""

from __future__ import annotations

import dataclasses
import sys
import time
import traceback
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def compile_arm(tag, model, params, tune_text, prompt_tokens, bs, res_in,
                groups, t_layers, aug=True, outer="epoch"):
    from aihab_clip_tpu.train.peft import (
        PEFTConfig,
        build_lock_mask,
        make_epoch_scan,
        make_train_step,
        partition_params,
    )

    config = model.config
    cfg = PEFTConfig(resolution=config.image_resolution, num_classes=20,
                     lr=5e-5, epochs=1,
                     crop_mode="random" if aug else "center",
                     flip=aug, rotation=aug, compute_dtype=jnp.bfloat16,
                     fused_prefix=0, scan_blocks=True, tune_text=tune_text,
                     num_templates=1,
                     # probe the RAW scanned body: since the r2 fix the
                     # train paths remat by default, which made every arm
                     # compile vacuously (r3 post-mortem) — the ladder
                     # exists to tell us when the UN-remat'd body works
                     scan_remat=False)
    mask = build_lock_mask(params, config.vision_layers,
                           config.transformer_layers,
                           unlocked_groups=groups, tune_text=tune_text,
                           unlocked_text_layers=t_layers)
    trainable, frozen = partition_params(params, mask)
    # text_weights only matter when tune_text is off (static head)
    tw = (None if tune_text
          else jnp.zeros((config.embed_dim, 20), jnp.float32))
    n = 2 * bs
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(n, res_in, res_in, 3),
                                    dtype=np.uint8))
    labels = jnp.zeros((n,), jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32).reshape(2, bs)
    valid = jnp.ones((2, bs), bool)

    t0 = time.perf_counter()
    try:
        if outer == "step":  # single train step, no outer epoch scan
            opt, step_fn = make_train_step(
                model, cfg, tw, prompt_tokens if tune_text else None)
            opt_state = opt.init(trainable)
            lowered = step_fn.lower(trainable, frozen, opt_state,
                                    imgs[:bs], labels[:bs], valid[0],
                                    jax.random.key(7), jnp.float32(cfg.lr))
        else:
            opt, epoch_fn = make_epoch_scan(
                model, cfg, tw, prompt_tokens if tune_text else None)
            opt_state = opt.init(trainable)
            lowered = epoch_fn.lower(trainable, frozen, opt_state, imgs,
                                     labels, idx, valid, jax.random.key(7),
                                     jnp.float32(cfg.lr))
        lowered.compile()
        log(f"  [{tag}] COMPILED in {time.perf_counter() - t0:.0f}s")
        return "ok"
    except Exception as e:  # noqa: BLE001 — the crash class varies
        log(f"  [{tag}] CRASH after {time.perf_counter() - t0:.0f}s: "
            f"{type(e).__name__}: {str(e)[:300]}")
        if "--trace" in sys.argv:
            traceback.print_exc()
        return f"crash: {type(e).__name__}"


def main():
    from aihab_clip_tpu.models import load

    tiny = "--tiny" in sys.argv
    arms = [1, 2, 3, 4]
    if "--arms" in sys.argv:
        i = sys.argv.index("--arms")
        arms = [int(x) for x in sys.argv[i + 1].split(",")]

    log(f"device: {jax.devices()[0]}")
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        bundle = load("random:SigLIP-Tiny" if tiny
                      else "random:ViT-SO400M-16-SigLIP2-384", seed=0,
                      dtype=jnp.bfloat16)
    model, params, config = bundle.model, bundle.params, bundle.config
    bs, groups, t_layers = (4, 1, 1) if tiny else (16, 11, 1)
    res_in = 64 if tiny else 439
    rng = np.random.default_rng(1)
    prompt_tokens = jnp.asarray(rng.integers(
        0, config.vocab_size, size=(20, config.context_length),
        dtype=np.int32))

    results = {}
    if 1 in arms:
        results[1] = compile_arm("1 image-only scan", model, params, False,
                                 prompt_tokens, bs, res_in, groups, 0)
    if 2 in arms:
        # suppress the TEXT tower's scan: force scan_blocks=False inside
        # the text-head recompute while the vision tower still scans
        import aihab_clip_tpu.train.peft as peft_mod

        orig = peft_mod.compute_text_weights
        peft_mod.compute_text_weights = partial(orig, scan_blocks=False)
        try:
            results[2] = compile_arm("2 tune_text, text scan OFF", model,
                                     params, True, prompt_tokens, bs,
                                     res_in, groups, t_layers)
        finally:
            peft_mod.compute_text_weights = orig
    if 3 in arms and not tiny:
        half_cfg = dataclasses.replace(
            config, vision_layers=config.vision_layers // 2)
        from aihab_clip_tpu.models.siglip import SigLIPModel

        half_model = SigLIPModel(half_cfg, dtype=jnp.bfloat16)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            half_params = half_model.init(
                jax.random.key(0),
                jnp.zeros((1, half_cfg.image_resolution,
                           half_cfg.image_resolution, 3)),
                jnp.zeros((1, half_cfg.context_length), jnp.int32),
            )["params"]
        results[3] = compile_arm("3 tune_text, half-depth vision",
                                 half_model, half_params, True,
                                 prompt_tokens, bs, res_in,
                                 max(1, groups // 2), t_layers)
    if 4 in arms:
        results[4] = compile_arm("4 full config (known crash)", model,
                                 params, True, prompt_tokens, bs, res_in,
                                 groups, t_layers)
    if 5 in arms:  # no outer epoch scan: one bare train step
        results[5] = compile_arm("5 single step (no epoch scan)", model,
                                 params, False, prompt_tokens, bs, res_in,
                                 groups, 0, outer="step")
    if 6 in arms:  # no augmentation warp (center crop, no flip/rotation)
        results[6] = compile_arm("6 image-only, aug OFF", model, params,
                                 False, prompt_tokens, bs, res_in, groups,
                                 0, aug=False)
    if 7 in arms:  # single bare step without aug — minimal scan ingredient
        results[7] = compile_arm("7 single step, aug OFF", model, params,
                                 False, prompt_tokens, bs, res_in, groups,
                                 0, aug=False, outer="step")
    if 8 in arms:  # full config but XLA attention forced inside the scan
        from aihab_clip_tpu.ops.attention import xla_attention_dispatch

        with xla_attention_dispatch():
            results[8] = compile_arm("8 full config, XLA attention", model,
                                     params, True, prompt_tokens, bs,
                                     res_in, groups, t_layers)

    # ---- shape probes on the raw scanned encode (no PEFT harness) ----
    def probe(tag, cfg2, params2, batch, grad):
        from aihab_clip_tpu.models.fast_siglip import (
            siglip_encode_scan,
            stack_block_params,
        )

        stacked = stack_block_params(params2["visual"], 0,
                                     cfg2.vision_layers)
        x = jnp.zeros((batch, cfg2.image_resolution,
                       cfg2.image_resolution, 3), jnp.bfloat16)

        def fwd(st, xin):
            out = siglip_encode_scan(params2, xin, cfg2, stacked=st)
            return jnp.sum(out.astype(jnp.float32))

        fn = jax.grad(fwd) if grad else fwd
        t0 = time.perf_counter()
        try:
            jax.jit(fn).lower(stacked, x).compile()
            log(f"  [{tag}] COMPILED in {time.perf_counter() - t0:.0f}s")
            return "ok"
        except Exception as e:  # noqa: BLE001
            log(f"  [{tag}] CRASH after {time.perf_counter() - t0:.0f}s: "
                f"{type(e).__name__}: {str(e)[:200]}")
            return f"crash: {type(e).__name__}"

    def shrink(**kw):
        from aihab_clip_tpu.models.siglip import SigLIPModel

        cfg2 = dataclasses.replace(config, **kw)
        m2 = SigLIPModel(cfg2, dtype=jnp.bfloat16)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            p2 = m2.init(jax.random.key(0),
                         jnp.zeros((1, cfg2.image_resolution,
                                    cfg2.image_resolution, 3)),
                         jnp.zeros((1, cfg2.context_length), jnp.int32),
                         )["params"]
        return cfg2, p2

    if 9 in arms:   # forward-only scan at full dims
        results[9] = probe("9 encode-scan fwd only", config, params, bs,
                           grad=False)
    if 10 in arms:  # grad of scan, depth 2, full width/seq
        c2, p2 = shrink(vision_layers=2)
        results[10] = probe("10 grad, depth 2", c2, p2, bs, grad=True)
    if 11 in arms:  # grad of scan, batch 2, full dims
        results[11] = probe("11 grad, batch 2", config, params, 2,
                            grad=True)
    if 12 in arms:  # grad of scan, 224px (S=196), full width/depth
        c2, p2 = shrink(image_resolution=224)
        results[12] = probe("12 grad, 224px", c2, p2, bs, grad=True)
    if 13 in arms:  # grad of scan at the full harness batch
        results[13] = probe(f"13 grad, batch {bs}", config, params, bs,
                            grad=True)
    if 15 in arms:  # grad at the harness batch, XLA attention forced
        from aihab_clip_tpu.ops.attention import xla_attention_dispatch

        with xla_attention_dispatch():
            results[15] = probe(f"15 grad b{bs}, XLA attn", config, params,
                                bs, grad=True)
    if 16 in arms:  # batch threshold, natural (fused) dispatch
        for b in (4, 8):
            results[16] = results.get(16, {})
            results[16][b] = probe(f"16 grad, batch {b}", config, params,
                                   b, grad=True)
    if 17 in arms:  # remat'd scan body at the crashing batch
        from aihab_clip_tpu.models.fast_siglip import (
            _canonical_siglip_block,
            stack_block_params,
        )

        stacked17 = stack_block_params(params["visual"], 0,
                                       config.vision_layers)
        x17 = jnp.zeros((16, config.image_resolution,
                         config.image_resolution, 3), jnp.bfloat16)

        def encode_remat(st, xin):
            from aihab_clip_tpu.models.fast_siglip import (
                _map_pool,
                _siglip_embed,
            )

            h = _siglip_embed(params["visual"], xin, config, jnp.bfloat16)
            body = jax.checkpoint(
                lambda hh, bp: (_canonical_siglip_block(
                    hh, bp, config.vision_heads, jnp.bfloat16), None))
            h, _ = jax.lax.scan(body, h, st)
            pooled = _map_pool(params["visual"], h, config, jnp.bfloat16)
            return jnp.sum(pooled.astype(jnp.float32))

        t0 = time.perf_counter()
        try:
            jax.jit(jax.grad(encode_remat)).lower(stacked17, x17).compile()
            log(f"  [17 grad b16, remat body] COMPILED in "
                f"{time.perf_counter() - t0:.0f}s")
            results[17] = "ok"
        except Exception as e:  # noqa: BLE001
            log(f"  [17 grad b16, remat body] CRASH after "
                f"{time.perf_counter() - t0:.0f}s: {type(e).__name__}")
            results[17] = f"crash: {type(e).__name__}"
    if 14 in arms:  # grad + Adam update over the stacked block params
        import optax

        from aihab_clip_tpu.models.fast_siglip import (
            siglip_encode_scan,
            stack_block_params,
        )

        stacked0 = stack_block_params(params["visual"], 0,
                                      config.vision_layers)
        opt = optax.adam(5e-5)
        ost0 = opt.init(stacked0)
        x14 = jnp.zeros((bs, config.image_resolution,
                         config.image_resolution, 3), jnp.bfloat16)

        def step14(st, ost, xin):
            def fwd(stp):
                out = siglip_encode_scan(params, xin, config, stacked=stp)
                return jnp.sum(out.astype(jnp.float32))
            g = jax.grad(fwd)(st)
            up, ost = opt.update(g, ost, st)
            return optax.apply_updates(st, up), ost

        t0 = time.perf_counter()
        try:
            jax.jit(step14).lower(stacked0, ost0, x14).compile()
            log(f"  [14 grad+adam, batch {bs}] COMPILED in "
                f"{time.perf_counter() - t0:.0f}s")
            results[14] = "ok"
        except Exception as e:  # noqa: BLE001
            log(f"  [14 grad+adam, batch {bs}] CRASH after "
                f"{time.perf_counter() - t0:.0f}s: {type(e).__name__}")
            results[14] = f"crash: {type(e).__name__}"
    print({f"arm{k}": v for k, v in sorted(results.items())})


if __name__ == "__main__":
    main()
