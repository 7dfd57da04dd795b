"""Same-session A/B of the PEFT epoch-scan train step: canonical tower
vs frozen-prefix fused hybrid (`fused_prefix`), aug-from-439-uint8,
bf16 compute.

Default: ViT-B/16 @224 b64, unlocked_groups=2 (head + last block
trainable -> 11 frozen bottom blocks).  `--model siglip`: SO400M @384
b32, unlocked_groups=11 (the reference default) -> 17 frozen blocks.

`--quant` adds an int8-frozen-prefix arm (`prefix_quant=True`).

Usage: PYTHONPATH=/root/.axon_site:. python tools_dev/ab_peft_hybrid.py \
           [E_long] [--model vitb|siglip] [--quant] [--skip-canonical]
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


def main():
    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.train.peft import (PEFTConfig, build_lock_mask,
                                           make_epoch_scan, partition_params)

    argv = sys.argv[1:]
    if "--cpu" in argv:                 # parity/plumbing smoke off-TPU
        argv.remove("--cpu")
        jax.config.update("jax_platforms", "cpu")
    siglip = False
    convnext = False
    vit_tag = ""
    any_tag = ""
    if "--model" in argv:
        i = argv.index("--model")
        convnext = argv[i + 1] == "convnext"
        siglip = ("tiny" if argv[i + 1] == "tiny-siglip"
                  else argv[i + 1] == "siglip")
        vit_tag = {"vitl": "ViT-L/14", "vith": "ViT-H/14"}.get(argv[i + 1],
                                                               "")
        del argv[i:i + 2]
    if "--tag" in argv:
        # arbitrary zoo tag (r5: SigLIP-L / convnext_large_d / xxlarge
        # PEFT training rows, VERDICT item 7).  Pair with --bs/--groups.
        i = argv.index("--tag")
        any_tag = argv[i + 1]
        del argv[i:i + 2]

    def int_flag(name, default):
        if name in argv:
            i = argv.index(name)
            v = int(argv[i + 1])
            del argv[i:i + 2]
            return v
        return default

    flag_bs = int_flag("--bs", 0)
    flag_groups = int_flag("--groups", 0)
    flag_n = int_flag("--n", 0)
    quant = "--quant" in argv
    scan = "--scan" in argv  # scan_blocks arm (SigLIP only)
    skip_canonical = "--skip-canonical" in argv
    args = [a for a in argv if not a.startswith("--")]
    e_long = int(args[0]) if args else 10
    e_short = 2
    log(f"device: {jax.devices()[0]}")
    # bf16 COMPUTE dtype on the canonical module — the runner loads models
    # with compute_dtype_for_backend() (bf16 on TPU); loading with the
    # fp32 default would pit an fp32 canonical arm against a bf16 hybrid
    # and invalidate the A/B (params stay fp32, as in production)
    if siglip == "tiny":
        # CPU smoke of the siglip arms (incl. --scan) without SO400M cost
        bundle = load("random:SigLIP-Tiny", seed=0, dtype=jnp.bfloat16)
        n, bs, groups = 16, 8, 1
        siglip = True
    elif siglip:
        # init on the host CPU backend: the full fp32 model (incl. the
        # ~1.2 GB text embedding) next to Adam state + b16@384 backward
        # activations exceeds v5e HBM if initialized on device
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            bundle = load("random:ViT-SO400M-16-SigLIP2-384", seed=0,
                          dtype=jnp.bfloat16)
        n, bs, groups = 256, 16, 11  # reference-default unlock depth
    elif convnext:
        bundle = load("random:convnext_base_w", seed=0, dtype=jnp.bfloat16)
        n, bs, groups = 256, 64, 2
    elif vit_tag:
        # ViT-L/H PEFT training rows (VERDICT r3 item 7): init on host
        # CPU (the fp32 master params next to Adam state + backward
        # activations are tight on v5e HBM at H scale)
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            bundle = load(f"random:{vit_tag}", seed=0, dtype=jnp.bfloat16)
        n, bs, groups = (128, 32, 2) if vit_tag == "ViT-L/14" else \
            (64, 16, 2)
    elif any_tag:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            bundle = load(f"random:{any_tag}", seed=0, dtype=jnp.bfloat16)
        n, bs, groups = 128, 16, 2
        siglip = "SigLIP" in any_tag or "siglip" in any_tag
    else:
        bundle = load("random:ViT-B/16", seed=0, dtype=jnp.bfloat16)
        n, bs, groups = 512, 64, 2
    model, params, config = bundle.model, bundle.params, bundle.config
    if flag_bs:
        bs = flag_bs
    if flag_groups:
        groups = flag_groups
    n = flag_n or n
    n = max(n, bs)
    n -= n % bs
    is_cnx = getattr(config, "vision_tower", "") == "convnext"
    n_blocks = sum(config.vision_layers) if is_cnx else config.vision_layers
    prefix = n_blocks + 1 - groups
    res, res_in = config.image_resolution, (64 if bs <= 8 else 439)

    steps = n // bs
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, size=(n, res_in, res_in, 3),
                                    dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, 20, size=(n,), dtype=np.int32))
    tw = rng.standard_normal((config.embed_dim, 20)).astype(np.float32)
    tw = jnp.asarray(tw / np.linalg.norm(tw, axis=0, keepdims=True))
    idx = jnp.asarray(
        rng.permuted(np.tile(np.arange(n, dtype=np.int32), 1)
                     ).reshape(steps, bs))
    valid = jnp.ones((steps, bs), bool)

    mask = build_lock_mask(params, config.vision_layers,
                           config.transformer_layers, unlocked_groups=groups,
                           tower="convnext" if is_cnx else "")
    trainable0, frozen = partition_params(params, mask)
    if siglip or vit_tag or any_tag:
        # image-only step (tune_text off): the frozen text tower never
        # participates — drop it so big towers fit v5e HBM next to Adam
        # state + activations (SO400M's 256k-row token embedding alone
        # is ~1.2 GB fp32)
        frozen = {k: v for k, v in frozen.items() if k != "text"}
    if siglip or vit_tag or any_tag:
        # host-CPU-inited bundles MUST move the frozen tree onto the
        # device once, up front — leaving it on the CPU backend re-ships
        # the whole tree through the tunnel every step (measured: ViT-L
        # canonical 5,701 ms/step before this device_put, r5)
        dev = jax.devices()[0]
        frozen = jax.device_put(frozen, dev)
    trainable0_host = jax.tree.map(np.asarray, trainable0)

    # (fused_prefix, prefix_quant, scan_blocks) arms; canonical repeated
    # last as the A/B/A control
    variants = [(0, False, False), (prefix, False, False), (0, False, False)]
    if quant:
        variants = [(0, False, False), (prefix, False, False),
                    (prefix, True, False), (0, False, False)]
    if scan:
        variants = [(0, False, False), (0, False, True),
                    (prefix, False, False), (0, False, False)]
    if skip_canonical:
        variants = [v for v in variants if v[0] != 0 or v[2]]

    results = {}
    for fused_prefix, pq, sb in variants:
        cfg = PEFTConfig(resolution=res, num_classes=20, lr=5e-5, epochs=1,
                         crop_mode="random", flip=True, rotation=True,
                         compute_dtype=jnp.bfloat16,
                         fused_prefix=fused_prefix, prefix_quant=pq,
                         scan_blocks=sb)
        opt, epoch_fn = make_epoch_scan(model, cfg, tw, None)
        base_tag = ("scan_blocks" if sb else f"fused_prefix={fused_prefix}"
                    + (" int8" if pq else ""))
        tag = base_tag + ("" if base_tag not in results else " (re)")

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

        t0 = time.perf_counter()
        run(1)
        log(f"  {tag}: compile+first epoch {time.perf_counter() - t0:.0f}s")
        run(e_short)  # warm both chain lengths
        run(e_long)
        # MEDIAN-OF-3 differenced windows: the shared tunnel/device shows
        # multi-x step-time swings between identical compiled arms
        # (PERF_NOTES "Measurement variance warning", re-confirmed r5:
        # 120 vs 40 ms/step back-to-back at SigLIP-L) — single samples
        # at big-model configs are meaningless.  Median, not min: with
        # DIFFERENCED windows contention on the short chain biases the
        # estimate LOW, so min() would select the artifact.
        windows = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(e_short)
            ts = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(e_long)
            tl = time.perf_counter() - t0
            ms = (tl - ts) / ((e_long - e_short) * steps) * 1e3
            log(f"    window: {ms:.1f} ms/step")
            windows.append(ms)
        ms = sorted(windows)[1]
        log(f"  {tag}: {ms:.1f} ms/step -> {bs / ms * 1e3:,.0f} img/s "
            "(median of 3)")
        results[tag] = round(ms, 2)
    print(results)


if __name__ == "__main__":
    main()
