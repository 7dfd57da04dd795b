"""Full-step SO400M training measurement at the reference's default config
(VERDICT r1 item 8).

The r1 SO400M numbers measured an image-only step (text tower dropped,
diag arms omitted Adam/aug/embed-grad).  This measures the COMPLETE
``make_epoch_scan`` step exactly as `runner.run_peft` builds it:

  * tune_text ON (text head re-encoded from the 20 CS prompt tokens
    every step, reference `methods/PEFT_openclip.py:253-258` semantics),
  * unlocked_groups=11 / unlocked_layers=1 (reference configs/base.yaml),
  * Adam + augmentation + full gradient flow (incl. patch embed),
  * batch 16 @ 384 (reference configs/cs.yaml),
  * plus one full validation pass (the val_interval cost), measured
    separately.

Arms: canonical | hybrid (fused_prefix=auto -> 17 frozen bottom blocks
through the forward-only fused kernels) | scan_blocks | canonical again
(A/B/A control).  Reports ms/step, img/s, analytic training MFU, and
compile time per arm.

Usage: PYTHONPATH=/root/.axon_site:. python tools_dev/ab_so400m_fullstep.py \
           [epochs_long] [--arms canonical,hybrid,scan]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from aihab_clip_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def train_step_gflops(cfg_model, batch: int, n_prompts: int,
                      unlocked_groups: int, unlocked_layers: int) -> float:
    """Analytic MAC-derived GFLOPs for one full train step.

    Frozen prefix blocks run forward-only (their inputs carry no
    gradient, XLA prunes the dx chain below the first trainable block);
    trainable blocks cost 3x forward (fwd + dW + dx).  MXU-dominant
    terms only (GEMMs; LN/softmax/elementwise excluded, consistent with
    bench.py's encode speed-of-light accounting)."""
    W = cfg_model.vision_width
    patch = (getattr(cfg_model, "vision_patch_size", None)
             or cfg_model.patch_size)
    S = (cfg_model.image_resolution // patch) ** 2
    L = cfg_model.vision_layers
    H2 = getattr(cfg_model, "vision_mlp_dim", 0) or 4 * W
    per_block = (S * W * 3 * W + S * S * W * 2 + S * W * W
                 + 2 * S * W * H2) * 2  # MACs*2
    embed = S * W * (patch ** 2 * 3) * 2
    # SigLIP MAP head: probe-query attention over S tokens + its MLP
    pool = ((S * W * W * 3 + S * W * W + 2 * W * H2) * 2
            if hasattr(cfg_model, "vision_preproj_dim") else 0)
    suffix_blocks = min(max(unlocked_groups - 1, 0), L)
    prefix_blocks = L - suffix_blocks
    vis = (embed * 3 + prefix_blocks * per_block
           + suffix_blocks * per_block * 3 + pool * 3)

    tW = getattr(cfg_model, "transformer_width", 0) or cfg_model.text_width
    tS = cfg_model.context_length
    tL = cfg_model.transformer_layers
    tH2 = getattr(cfg_model, "text_mlp_dim", 0) or 4 * tW
    t_block = (tS * tW * 3 * tW + tS * tS * tW * 2 + tS * tW * tW
               + 2 * tS * tW * tH2) * 2
    t_suffix = min(unlocked_layers, tL)
    txt = (tL - t_suffix) * t_block + t_suffix * t_block * 3
    txt += tS * tW * cfg_model.embed_dim * 2 * 3  # text projection
    return (batch * vis + n_prompts * txt) / 1e9


def main():
    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.train.peft import (PEFTConfig, build_lock_mask,
                                           make_epoch_scan, partition_params)
    from bench import chip_peak_tflops

    argv = sys.argv[1:]
    arms = ["canonical", "hybrid", "scan", "canonical"]
    if "--arms" in argv:
        i = argv.index("--arms")
        arms = argv[i + 1].split(",")
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    e_long = int(args[0]) if args else 6
    e_short = 2

    tiny = "--tiny" in argv  # CPU smoke of the full harness
    dev = jax.devices()[0]
    log(f"device: {dev}")

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        bundle = load("random:SigLIP-Tiny" if tiny
                      else "random:ViT-SO400M-16-SigLIP2-384", seed=0,
                      dtype=jnp.bfloat16)
    model, params, config = bundle.model, bundle.params, bundle.config
    if tiny:
        n, bs, groups, t_layers = 32, 8, 2, 1
    else:
        n, bs, groups, t_layers = 128, 16, 11, 1  # reference defaults
    res = config.image_resolution
    prefix = config.vision_layers + 1 - groups

    rng = np.random.default_rng(0)
    res_in = 64 if tiny else 439
    imgs = jnp.asarray(rng.integers(0, 256, size=(n, res_in, res_in, 3),
                                    dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 20, size=(n,), dtype=np.int32))
    steps = n // bs
    idx = jnp.asarray(rng.permuted(np.arange(n, dtype=np.int32))
                      .reshape(steps, bs))
    valid = jnp.ones((steps, bs), bool)
    # 20 CS prompts as token ids (values are irrelevant to step cost)
    n_prompts = 20
    prompt_tokens = jnp.asarray(rng.integers(
        0, config.vocab_size, size=(n_prompts, config.context_length),
        dtype=np.int32))

    mask = build_lock_mask(params, config.vision_layers,
                           config.transformer_layers,
                           unlocked_groups=groups,
                           tune_text=True, unlocked_text_layers=t_layers)
    trainable0, frozen = partition_params(params, mask)
    frozen = jax.device_put(frozen, dev)
    trainable0_host = jax.tree.map(np.asarray, trainable0)
    n_train = sum(x.size for x in jax.tree.leaves(trainable0))
    log(f"trainable params: {n_train / 1e6:.1f}M; "
        f"frozen: {sum(x.size for x in jax.tree.leaves(frozen)) / 1e6:.1f}M")

    gflops = train_step_gflops(config, bs, n_prompts, groups, t_layers)
    peak = chip_peak_tflops(dev)
    log(f"analytic step GFLOPs: {gflops:.0f}; chip peak {peak} TFLOPs")

    results = {}
    for arm_i, arm in enumerate(arms):
        cfg = PEFTConfig(resolution=res, num_classes=20, lr=5e-5, epochs=1,
                         crop_mode="random", flip=True, rotation=True,
                         tune_text=True, num_templates=1,
                         compute_dtype=jnp.bfloat16,
                         fused_prefix=prefix if arm == "hybrid" else 0,
                         scan_blocks=arm == "scan")
        opt, epoch_fn = make_epoch_scan(model, cfg, None, prompt_tokens)
        tag = arm if arm not in results else f"{arm} (control)"

        def run(n_epochs):
            trainable = jax.tree.map(jnp.asarray, trainable0_host)
            opt_state = opt.init(trainable)
            key = jax.random.PRNGKey(0)
            out = None
            for e in range(n_epochs):
                trainable, opt_state, out = epoch_fn(
                    trainable, frozen, opt_state, imgs, labels, idx, valid,
                    jax.random.fold_in(key, e), jnp.float32(cfg.lr))
            return float(out["loss_sum"])

        try:
            t0 = time.perf_counter()
            run(1)
            t_compile = time.perf_counter() - t0
            log(f"  {tag}: compile+first epoch {t_compile:.0f}s")
            run(e_short)
            run(e_long)
        except Exception as e:
            log(f"  {tag}: FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:200]}")
            results[tag] = None
            continue
        # 3 paired windows, report the MIN (PERF_NOTES "Measurement
        # variance warning": identical compiled arms have measured
        # 108.8 vs 385.3 ms back-to-back through the shared tunnel, and
        # a single-sample diff once produced a physically impossible
        # 138% 'MFU' reading — single samples at this config are
        # meaningless)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(e_short)
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(e_long)
            tl = time.perf_counter() - t0
            samples.append((tl - ts) / ((e_long - e_short) * steps) * 1e3)
        ms = min(samples)
        mfu = gflops / (ms / 1e3) / 1e3 / peak
        log(f"  {tag}: {ms:.1f} ms/step (samples "
            f"{[round(v, 1) for v in samples]}) -> "
            f"{bs / ms * 1e3:,.0f} img/s, "
            f"training MFU {mfu:.1%} (compile {t_compile:.0f}s)")
        results[tag] = {"ms_per_step": round(ms, 1),
                        "ms_samples": [round(v, 1) for v in samples],
                        "img_per_s": round(bs / ms * 1e3),
                        "train_mfu": round(mfu, 4),
                        "compile_s": round(t_compile)}

    # ---- validation pass (the val_interval cost), measured once:
    # eval-preprocess + encode + logits + on-device metric update over the
    # same 128 images, b16 — what `finetune` runs every val_interval epochs
    try:
        from aihab_clip_tpu.ops import metrics as M
        from aihab_clip_tpu.train.evaluate import make_eval_step
        from aihab_clip_tpu.train.peft import merge_params

        params_dev = merge_params(
            jax.tree.map(jnp.asarray, trainable0_host), frozen)
        tw = rng.standard_normal((config.embed_dim, 20)).astype(np.float32)
        tw = jnp.asarray(tw / np.linalg.norm(tw, axis=0, keepdims=True))
        estep = make_eval_step(model, res, 20, jnp.bfloat16)

        def val_pass():
            state = M.init_metric_state(20)
            for s in range(steps):
                b = imgs[s * bs:(s + 1) * bs]
                state, _ = estep(params_dev, tw, b,
                                 labels[s * bs:(s + 1) * bs],
                                 jnp.ones((bs,), bool), state)
            return float(jax.tree.leaves(state)[0].sum())

        t0 = time.perf_counter()
        val_pass()
        log(f"  val: compile+first pass {time.perf_counter() - t0:.0f}s")
        val_pass()
        t0 = time.perf_counter()
        val_pass()
        val_s = time.perf_counter() - t0
        log(f"  val pass over {n} imgs: {val_s * 1e3:.0f} ms "
            f"({n / val_s:,.0f} img/s)")
        results["val_pass_ms_128imgs"] = round(val_s * 1e3)
    except Exception as e:
        log(f"  val: FAILED {type(e).__name__}: {str(e).splitlines()[0][:200]}")
    print(results)


if __name__ == "__main__":
    main()
