"""PEFT: partial-unfreeze fine-tuning of a CLIP tower.

Re-implements the reference method (`/root/reference/methods/PEFT_openclip.py`)
TPU-first:

  * freezing via *param partitioning*: the open_clip ``lock_image_tower
    (unlocked_groups)`` / ``lock_text_tower(unlocked_layers)`` semantics
    become boolean masks over the param tree (group list = [stem] +
    resblocks + [head]); trainable leaves are split out and only they are
    differentiated, so XLA prunes the dead backward graph below the
    earliest trainable layer (frozen params stay runtime arguments — see
    ``make_train_step``);
  * the whole step — device-side train augmentation, image encode,
    optional per-step text-head recompute (tune_text), logits, masked CE,
    Adam update — is ONE jitted, donated function; under a Mesh the batch
    is sharded over ``data`` and the GSPMD partitioner inserts the gradient
    all-reduce over ICI;
  * loss = CE(100 * normalize(img) @ text_weights, y); logit_scale is
    deliberately ignored (reference ``:262``);
  * Adam + cosine-annealed LR stepped per epoch (constant within an epoch,
    like torch's scheduler.step() placement);
  * periodic validation (``val_interval``) and final test reuse the
    device-resident evaluator (loss/top1/top3/F1/MCC/CM/L2 roll-up).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import traverse_util

from ..backend import dispatch_backend

from ..data.pipeline import SplitView
from ..models.clip import CLIPModel
from ..models.text_head import compute_text_weights
from .evaluate import evaluate, make_eval_step, masked_ce_metrics
from .prolip import cosine_lr
from .tracker import ClassificationTracker

# ---------------------------------------------------------------------------
# Lock masks (open_clip lock_image_tower / lock_text_tower semantics)
# ---------------------------------------------------------------------------


def _vit_group_of(path: Tuple[str, ...], num_layers: int) -> int:
    """Group index of a visual-tower param: 0 = stem (conv1 + class/pos
    embedding + ln_pre), 1..L = resblocks, L+1 = head (ln_post + proj)."""
    if path[0] == "transformer":
        # ('transformer', 'resblocks_i', ...)
        idx = int(path[1].split("_")[-1])
        return 1 + idx
    if path[0] in ("ln_post", "proj", "attnpool"):
        return num_layers + 1
    return 0


def _rn_group_of(path: Tuple[str, ...], num_stages: int = 4) -> int:
    """Group index of a ModifiedResNet param: 0 = stem (conv1-3 + bn1-3),
    1..4 = residual stages (``layer{s}_{blk}``), 5 = attnpool head —
    the same grouping open_clip's ``lock_image_tower`` uses for its
    ResNet towers (the reference calls it at
    `/root/reference/methods/PEFT_openclip.py:197`, ViT-only in practice;
    RN group masks extend PEFT beyond reference parity)."""
    if path[0].startswith("layer"):
        return int(path[0][len("layer"):].split("_")[0])
    if path[0] == "attnpool":
        return num_stages + 1
    return 0


def _convnext_group_of(path: Tuple[str, ...], depths: Tuple[int, ...]) -> int:
    """Group index of a ConvNeXt-tower param: 0 = stem, 1..sum(depths) =
    blocks in depth order (a stage's downsample belongs to its first
    block's group, matching timm's ``group_matcher`` — the grouping
    open_clip's ``lock_image_tower`` uses for timm trunks), last = head
    (head_norm + projection)."""
    name = path[0]
    if name.startswith("stage"):                 # stage{s}_block{b}
        s, b = name[len("stage"):].split("_block")
        return 1 + sum(depths[:int(s)]) + int(b)
    if name.startswith(("down_norm_", "down_conv_")):
        s = int(name.rsplit("_", 1)[-1])
        return 1 + sum(depths[:s])               # the stage's first block
    if name.startswith("head_"):
        return 1 + sum(depths)
    return 0                                     # stem_conv / stem_norm


def _text_group_of(path: Tuple[str, ...], num_layers: int) -> int:
    """0 = embeddings, 1..L = resblocks, L+1 = head (ln_final + projection)."""
    if path[0] == "transformer":
        idx = int(path[1].split("_")[-1])
        return 1 + idx
    if path[0] in ("ln_final", "text_projection"):
        return num_layers + 1
    return 0


def build_lock_mask(
    params: Dict,
    vision_layers: int,
    text_layers: int,
    unlocked_groups: int = 0,
    tune_text: bool = False,
    unlocked_text_layers: int = 0,
    is_vit: bool = True,
    tower: str = "",
) -> Dict:
    """Boolean pytree: True = trainable.

    ``unlocked_groups`` unlocks the LAST n visual groups (0 = vision fully
    frozen).  ViT groups: stem / L resblocks / head.  RN groups: stem /
    4 stages / attnpool.  ConvNeXt groups (``tower='convnext'``,
    ``vision_layers`` = the stage-depth tuple): stem / sum(depths) blocks /
    head.  ``tune_text`` with ``unlocked_text_layers`` unlocks the last n
    text groups; tune_text=False freezes the whole text tower.
    logit_scale stays frozen (it is unused by the loss).
    """
    if not tower:
        tower = "vit" if is_vit else "rn"
    if tower == "convnext":
        depths = tuple(vision_layers)
        n_vis_groups = sum(depths) + 2
    else:
        n_vis_groups = (vision_layers + 2) if tower == "vit" else 6
    n_txt_groups = text_layers + 2
    flat = traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        top = path[0]
        if path[-1] in ("mean", "var"):
            # FrozenBatchNorm statistics (RN/ConvNeXt towers store them as
            # params so one tree carries the whole checkpoint).  They are
            # *inference statistics*, not weights: open_clip's lock keeps
            # BN buffers untrainable at every unlock depth, and training
            # them as free parameters would silently de-normalize the
            # tower.  Unlocked stages train scale/bias over these fixed
            # stats (see PARITY.md "FrozenBatchNorm PEFT semantics").
            mask[path] = False
        elif top == "visual":
            if tower == "convnext":
                g = _convnext_group_of(path[1:], depths)
            elif tower == "vit":
                g = _vit_group_of(path[1:], vision_layers)
            else:
                g = _rn_group_of(path[1:])
            mask[path] = g >= (n_vis_groups - unlocked_groups)
        elif top == "text":
            if not tune_text:
                mask[path] = False
            else:
                g = _text_group_of(path[1:], text_layers)
                mask[path] = g >= (n_txt_groups - unlocked_text_layers)
        else:  # logit_scale etc.
            mask[path] = False
    return traverse_util.unflatten_dict(mask)


def partition_params(params: Dict, mask: Dict) -> Tuple[Dict, Dict]:
    """Split params into (trainable, frozen) trees by the boolean mask."""
    flat_p = traverse_util.flatten_dict(params)
    flat_m = traverse_util.flatten_dict(mask)
    train = {k: v for k, v in flat_p.items() if flat_m[k]}
    frozen = {k: v for k, v in flat_p.items() if not flat_m[k]}
    return (traverse_util.unflatten_dict(train),
            traverse_util.unflatten_dict(frozen))


def merge_params(trainable: Dict, frozen: Dict) -> Dict:
    flat = dict(traverse_util.flatten_dict(frozen))
    flat.update(traverse_util.flatten_dict(trainable))
    return traverse_util.unflatten_dict(flat)


def trainable_report(mask: Dict) -> Dict[str, Any]:
    """Summary of trainable vs frozen params (reference prints
    `/root/reference/methods/PEFT_openclip.py:208-229`)."""
    flat = traverse_util.flatten_dict(mask)
    trainable = [("/".join(k)) for k, v in flat.items() if v]
    frozen = [("/".join(k)) for k, v in flat.items() if not v]
    by_top: Dict[str, int] = {}
    for name in trainable:
        parts = name.split("/")
        top = "/".join(parts[:2]) if len(parts) > 1 else name
        by_top[top] = by_top.get(top, 0) + 1
    return {
        "num_trainable": len(trainable),
        "num_frozen": len(frozen),
        "fraction_trainable": len(trainable) / max(len(flat), 1),
        "by_top_module": by_top,
        "trainable_sample": trainable[:10],
        "trainable_visual": [n for n in trainable if n.startswith("visual")][:10],
        "trainable_text": [n for n in trainable if n.startswith("text")][:10],
    }


# ---------------------------------------------------------------------------
# Train step
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PEFTConfig:
    resolution: int
    num_classes: int
    lr: float
    epochs: int
    crop_mode: str = "random"
    flip: bool = False
    rotation: bool = False
    tune_text: bool = False
    num_templates: int = 1
    compute_dtype: Any = jnp.float32
    val_interval: int = 0
    aug_impl: str = "fast"   # 'fast' = matmul-formulated warp; 'exact' = per-image gather
    # False = per-step host loop; True = stage the whole split in HBM and
    # scan the epoch; "chunked" = double-buffered HBM chunks (datasets
    # larger than HBM): the next chunk's host gather + upload overlaps the
    # current chunk's on-device scan.  Chunked and full-scan training are
    # step-for-step identical (same batch order and augmentation keys).
    device_dataset: Any = False
    device_chunk_bytes: int = 1 << 30  # per-chunk image budget (2 buffers live)
    checkpoint_interval: int = 0  # save every N epochs (0 = final only)
    # frozen-prefix fused forward: run the bottom N frozen visual blocks
    # through the forward-only fused Pallas kernels inside the train step
    # (they receive no gradients — XLA prunes their backward — so the
    # canonical tower's ~50%-MFU forward there is pure waste next to the
    # fused stack's ~76%).  -1 = auto (resolved from unlocked_groups by
    # ``finetune``), 0 = off (canonical module), >0 = explicit block count.
    fused_prefix: int = -1
    # int8 frozen prefix (requires fused_prefix > 0): the frozen trunk is
    # forward-only, so it can ride the WHOLE-BLOCK int8 kernels (~2x MXU
    # rate; the fastest measured encode path).  Quantization happens
    # in-jit from the frozen params — once per epoch scan / once per step
    # — and never touches a gradient.  Opt-in: the suffix then trains on
    # int8-noise features (>0.995 tower cosine in tests), which matches
    # int8 serving but is not bit-identical to bf16 training.
    prefix_quant: bool = False
    # scan-over-blocks canonical encode (SigLIP towers): identical math
    # with ONE block body in the compiled program instead of L — ~L-fold
    # faster compiles for deep towers (the unrolled SO400M train graph
    # compiled in 1484 s).  Applies when the fused prefix is off; grads
    # flow through the in-jit stack -> lax.scan -> slice chain.
    scan_blocks: bool = False
    # remat the scanned body.  Un-remat'd grad-of-scan still crashes the
    # XLA:TPU compiler at SO400M [B>=16, S=576, W=1152] shapes (re-probed
    # r3: scan_remat=False died in ab_so400m_fullstep while the remat'd
    # body compiles; tools_dev/repro_scan_crash.py arm4 now pins
    # scan_remat=False so the ladder keeps testing the raw body).  Flip
    # to False to recover the ~2x remat recompute the day a toolchain
    # compiles arm4.
    scan_remat: bool = True
    # LoRA adapter fine-tuning (beyond-reference PEFT): rank > 0 freezes
    # the ENTIRE tower and trains low-rank (A, B) pairs on the block
    # attention (and optionally MLP) kernels; W_eff = W + (alpha/r)·A·B is
    # merged in-jit each step (one rank-r GEMM per target) so every encode
    # path runs the canonical tower on the effective weights.  See
    # ``train/lora.py``.
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_mlp: bool = False


def _quantize_prefix(model: CLIPModel, cfg: "PEFTConfig", frozen):
    """Quantize the frozen prefix blocks (all of resblocks_[0, fused_prefix)
    are frozen by construction — ``peft_fused_prefix_len``).  Returns the
    {resblocks_i: qblock} dict the hybrid encoders consume, or None when
    the int8 prefix is off."""
    if cfg.fused_prefix <= 0 or not cfg.prefix_quant:
        return None
    if getattr(model.config, "vision_tower", "") == "convnext":
        return None   # no int8 ConvNeXt prefix (second-order, BENCHMARKS)
    from ..models.siglip import SigLIPConfig

    if isinstance(model.config, SigLIPConfig):
        from ..models.fast_siglip import siglip_attn_groups
        from ..models.quant_siglip import quantize_siglip_block

        def qblock(b):
            # pass the grouping so the head-group regroup happens HERE
            # (once per run), not inside every train step; hybrid=True
            # selects the train-prefix grouping (4 hpg cap, r5)
            return quantize_siglip_block(
                b, model.config.vision_heads,
                siglip_attn_groups(model.config, hybrid=True))
    else:
        from ..models.quant_vit import quantize_vit_block as qblock
    blocks = frozen["visual"]["transformer"]
    return {f"resblocks_{i}": qblock(blocks[f"resblocks_{i}"])
            for i in range(cfg.fused_prefix)}


def _pack_prefix(model: CLIPModel, cfg: "PEFTConfig", frozen):
    """Pre-pack the SigLIP hybrid prefix's q/k/v group tensors ONCE (they
    are invariant across steps; packing in-step reshuffles ~16 MB of
    weights per block per step).  None when not applicable (bf16 SigLIP
    hybrid only — the int8 path packs inside quantization, the CLIP
    hybrid reads raw weights)."""
    if cfg.fused_prefix <= 0 or cfg.prefix_quant:
        return None
    from ..models.siglip import SigLIPConfig

    if not isinstance(model.config, SigLIPConfig):
        return None
    from ..models.fast_siglip import pack_siglip_fast_params

    return pack_siglip_fast_params(frozen, model.config, cfg.compute_dtype,
                                   stop=cfg.fused_prefix, hybrid=True)


def _encode_projected(model: CLIPModel, cfg: "PEFTConfig", params, x,
                      mesh=None, qprefix=None, pprefix=None):
    """The train-step image encode: frozen-prefix hybrid when enabled
    (TPU + ViT-family tower; pure-DP meshes run the fused prefix per
    shard — see ``peft_fused_prefix_len``; ``qprefix`` switches the
    prefix to the int8 kernels), canonical Flax module otherwise."""
    if cfg.fused_prefix > 0:
        from ..models.siglip import SigLIPConfig

        interpret = dispatch_backend() not in ("tpu",)
        if isinstance(model.config, SigLIPConfig):
            from ..models.fast_siglip import siglip_encode_hybrid

            return siglip_encode_hybrid(
                params, x, model.config, cfg.fused_prefix, project=True,
                dtype=cfg.compute_dtype, interpret=interpret, mesh=mesh,
                qprefix=qprefix, packed_prefix=pprefix)
        if getattr(model.config, "vision_tower", "") == "convnext":
            from ..models.fast_convnext import convnext_encode_hybrid

            return convnext_encode_hybrid(
                params, x, model.config, cfg.fused_prefix, project=True,
                dtype=cfg.compute_dtype, interpret=interpret, mesh=mesh)
        from ..models.fast_vit import vit_encode_hybrid

        return vit_encode_hybrid(
            params, x, model.config, cfg.fused_prefix, project=True,
            dtype=cfg.compute_dtype, interpret=interpret, mesh=mesh,
            qprefix=qprefix)
    if cfg.scan_blocks:
        from ..models.siglip import SigLIPConfig

        if isinstance(model.config, SigLIPConfig):
            from ..models.fast_siglip import siglip_encode_scan

            # cfg.scan_remat stays True by default: the un-remat'd
            # grad-of-scan body still crashes the XLA:TPU compiler at
            # SO400M shapes (PERF_NOTES "Standing re-probes" r3).
            # scan_remat=False is the probe/opt-out, not the default.
            return siglip_encode_scan(params, x, model.config, project=True,
                                      dtype=cfg.compute_dtype,
                                      remat=cfg.scan_remat)
        if model.config.is_vit:
            from ..models.fast_vit import vit_encode_scan

            return vit_encode_scan(params, x, model.config, project=True,
                                   dtype=cfg.compute_dtype,
                                   remat=cfg.scan_remat)
        # RN towers have no block stack to scan — canonical module below
    return model.apply({"params": params}, x,
                       method=type(model).encode_image, project=True)


def _merge_for_step(cfg: "PEFTConfig", trainable, frozen):
    """trainable+frozen -> full param tree: plain dict merge for
    partial-unfreeze; LoRA merges W_eff = W + (alpha/r)·A·B in-jit."""
    if cfg.lora_rank > 0:
        from .lora import lora_merge

        return lora_merge(frozen, trainable, cfg.lora_alpha)
    return merge_params(trainable, frozen)


def _build_loss_fn(model: CLIPModel, cfg: PEFTConfig,
                   text_weights: Optional[jax.Array],
                   prompt_tokens: Optional[jax.Array], mesh=None):
    """The shared PEFT train objective: augment -> encode -> normalize ->
    (optionally recomputed) text head -> masked CE.  Used verbatim by both
    the per-step and the epoch-scan regimes, which therefore stay
    step-for-step identical by construction."""
    from ..ops.fast_warp import fast_train_transform
    from ..ops.preprocess import normalize_stats_for
    from ..ops.preprocess import train_transform as exact_train_transform

    aug_fn = (fast_train_transform if cfg.aug_impl == "fast"
              else exact_train_transform)
    nmean, nstd = normalize_stats_for(model.config)

    def loss_fn(trainable, frozen, images_u8, labels, valid, key,
                qprefix=None, pprefix=None):
        params = _merge_for_step(cfg, trainable, frozen)
        x = aug_fn(images_u8, key, cfg.resolution, crop_mode=cfg.crop_mode,
                   flip=cfg.flip, rotation=cfg.rotation,
                   dtype=cfg.compute_dtype, mean=nmean, std=nstd)
        _, feats = _encode_projected(model, cfg, params, x, mesh=mesh,
                                     qprefix=qprefix, pprefix=pprefix)
        feats = feats.astype(jnp.float32)
        feats = feats / jnp.maximum(
            jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        if cfg.tune_text:
            w = compute_text_weights(model, params, prompt_tokens,
                                     cfg.num_classes, cfg.num_templates,
                                     scan_blocks=cfg.scan_blocks)
        else:
            w = text_weights
        logits = 100.0 * feats @ w
        return masked_ce_metrics(logits, labels, valid)

    return loss_fn


def make_train_step(model: CLIPModel, cfg: PEFTConfig,
                    text_weights: Optional[jax.Array],
                    prompt_tokens: Optional[jax.Array], mesh=None,
                    donate: bool = False):
    """Build the jitted PEFT step.

    Returns (opt, step) where step(trainable, frozen, opt_state, images_u8,
    labels, valid, key, lr[, qprefix]) -> (trainable, opt_state, metrics
    dict).  ``qprefix`` (from ``_quantize_prefix``) is quantized ONCE by
    the caller — it is invariant across the run, and re-quantizing ~GBs of
    frozen weights inside every step would tax the hot path.

    ``frozen`` params are a runtime ARGUMENT, never a closure constant:
    closing over a frozen tower embeds its weights into the compiled
    program (hundreds of MB for real models — observed as oversized
    remote-compile payloads) and forces recompilation when they change."""
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)

    loss_fn = _build_loss_fn(model, cfg, text_weights, prompt_tokens,
                             mesh=mesh)

    # donate=True donates the train state: without donation XLA holds old
    # + new copies of params and both Adam moments live across the update
    # — a ~2x transient on exactly the footprint FSDP runs shard to fit
    # HBM.  Opt-in because donation consumes the caller's input buffers:
    # the finetune driver rebinds both returns every step (and owns its
    # trainable copy), but direct callers often feed one initial state to
    # several step functions for A/B comparison.
    @partial(jax.jit, donate_argnums=(0, 2) if donate else ())
    def jit_step(trainable, frozen, opt_state, images_u8, labels, valid,
                 key, lr, qprefix=None, pprefix=None):
        (loss, (correct, n_valid)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable, frozen, images_u8, labels,
                                   valid, key, qprefix, pprefix)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = opt.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return trainable, opt_state, {"loss": loss, "correct": correct,
                                      "n_valid": n_valid}

    if mesh is None:
        return opt, jit_step

    from ..ops.attention import xla_attention_dispatch

    def step(*args, **kw):
        # mesh runs: keep attention on the GSPMD-partitionable XLA path
        # (a pallas_call — forward or its custom-VJP backward — is opaque
        # to the partitioner and would gather/replicate its operands);
        # active on every call so the first (tracing) call bakes it in
        with xla_attention_dispatch():
            return jit_step(*args, **kw)

    return opt, step


def make_epoch_scan(model: CLIPModel, cfg: PEFTConfig,
                    text_weights: Optional[jax.Array],
                    prompt_tokens: Optional[jax.Array]):
    """One jitted call per EPOCH: the train split lives in HBM and a
    lax.scan drives every optimizer step on device.

    Eliminates per-batch host round-trips (the dominant cost of small-batch
    fine-tuning over a remote device: a tiny-model epoch measured ~100 ms
    per *dispatch* vs 0.2 s for the whole epoch once scanned).  The batch
    order is supplied by the host (same shuffle as the host loop), so both
    paths are step-for-step equivalent."""
    opt = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)

    loss_fn = _build_loss_fn(model, cfg, text_weights, prompt_tokens)

    @partial(jax.jit, donate_argnums=(0, 2))
    def epoch_fn(trainable, frozen, opt_state, images_all, labels_all,
                 batch_idx, batch_valid, epoch_key, lr,
                 step0: jax.Array | int = 0, qprefix=None, pprefix=None):
        """batch_idx: [steps, B] int32 gather indices into images_all;
        batch_valid: [steps, B] bool (padding rows False).  ``step0`` is
        the global step offset of this call within the epoch (nonzero for
        chunked epochs), keeping augmentation keys identical to one
        whole-epoch scan."""
        if qprefix is None and pprefix is None:
            # fallback for callers that did not precompute the frozen
            # prefix: quantize/pack ONCE per epoch call, outside the scan
            # body.  The driver precomputes per RUN instead — the chunked
            # regime invokes epoch_fn n_chunks times per epoch, and
            # requantizing the frozen tower per chunk is pure rework.
            qprefix = _quantize_prefix(model, cfg, frozen)
            pprefix = _pack_prefix(model, cfg, frozen)

        def body(carry, sb):
            trainable, opt_state = carry
            idx, valid, bi = sb
            images = jnp.take(images_all, idx, axis=0)
            labels = jnp.take(labels_all, idx, axis=0)
            key = jax.random.fold_in(epoch_key, step0 + bi)
            (loss, (correct, n_valid)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable, frozen, images, labels,
                                       valid, key, qprefix, pprefix)
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = opt.update(grads, opt_state, trainable)
            trainable = optax.apply_updates(trainable, updates)
            return (trainable, opt_state), (loss, correct, n_valid)

        steps = batch_idx.shape[0]
        (trainable, opt_state), (losses, corrects, n_valids) = jax.lax.scan(
            body, (trainable, opt_state),
            (batch_idx, batch_valid, jnp.arange(steps)))
        return trainable, opt_state, {
            "loss_sum": jnp.sum(losses),
            "batches": steps,
            "correct": jnp.sum(corrects),
            "n_valid": jnp.sum(n_valids),
        }

    return opt, epoch_fn


def _epoch_batch_indices(view: SplitView, epoch: int):
    """The host-side batch order of SplitView.batches(epoch) as padded
    index/valid arrays [steps, B] (relative to the view's selection)."""
    order = np.arange(view.num_samples)
    if view.shuffle:
        rng = np.random.RandomState((view.seed * 100003 + epoch) % (2 ** 31))
        order = order[rng.permutation(len(order))]
    bs = view.batch_size
    steps = (len(order) + bs - 1) // bs
    idx = np.zeros((steps, bs), np.int32)
    valid = np.zeros((steps, bs), bool)
    for s in range(steps):
        chunk = order[s * bs:(s + 1) * bs]
        idx[s, :len(chunk)] = chunk
        valid[s, :len(chunk)] = True
    return idx, valid


# ---------------------------------------------------------------------------
# Full fine-tune driver
# ---------------------------------------------------------------------------


def finetune(
    model: CLIPModel,
    params: Dict,
    train_view: SplitView,
    val_view: Optional[SplitView],
    test_view: Optional[SplitView],
    cfg: PEFTConfig,
    text_weights: Optional[jax.Array] = None,
    prompt_tokens: Optional[jax.Array] = None,
    unlocked_groups: int = 1,
    unlocked_text_layers: int = 0,
    seed: int = 0,
    l2_eval_ctx: Optional[Dict] = None,
    return_confusion_matrix: bool = True,
    track_test: bool = True,
    logger=None,
    verbose: bool = True,
    profile_dir: Optional[str] = None,
    checkpoint_fn=None,
    resume_from=None,
    mesh=None,
    fsdp: bool = False,
) -> Dict[str, Any]:
    """Run the PEFT loop.  Returns the reference's result contract:
    {val: {...}|None, test: {...}|None, params, tracker, report}.

    ``checkpoint_fn(params, opt_state, epoch)`` is called every
    ``cfg.checkpoint_interval`` epochs; ``resume_from`` (a checkpoint
    directory) restores params + optimizer state + epoch position, and
    training continues from there — bitwise-continuous with an
    uninterrupted run (epoch keys, shuffle order, and the cosine schedule
    all index the ABSOLUTE epoch).

    ``mesh``: run the train/eval steps SPMD over a (data, model) mesh —
    params placed per the TP rules (replicated when model axis is 1),
    batches sharded over ``data``, gradient all-reduce inserted by GSPMD
    over ICI.  The scan/chunked epoch regimes are single-device dispatch
    optimizations and fall back to the per-step loop under a mesh.

    ``fsdp``: additionally shard params AND Adam moments over the data
    axis (ZeRO-3 style; see ``parallel.param_pspec``) — for towers whose
    replicated params + optimizer state would not fit per-chip HBM (e.g.
    SO400M + fp32 Adam moments).  GSPMD inserts the all-gathers; the
    fused-prefix hybrid is disabled (its shard_map prefix assumes
    replicated weights)."""
    ccfg = model.config
    if fsdp and mesh is None:
        raise ValueError("fsdp=True requires a mesh")
    if cfg.lora_rank > 0:
        # LoRA mode: the whole tower freezes; the lock-mask / fused-prefix
        # machinery below does not apply (adapters sit on every block)
        if resume_from is not None:
            raise ValueError("finetune.resume is not supported with LoRA "
                             "(checkpoints store merged weights, not "
                             "adapters); restart the adapter run instead")
        if mesh is not None:
            from ..parallel import MODEL_AXIS

            if mesh.shape[MODEL_AXIS] > 1:
                raise ValueError("LoRA does not compose with tensor "
                                 "parallelism (adapter deltas are "
                                 "replicated; base kernels would be "
                                 "column/row-sharded)")
        if cfg.fused_prefix != 0:
            cfg = dataclasses.replace(cfg, fused_prefix=0, prefix_quant=False)
    tower = getattr(ccfg, "vision_tower", "") or (
        "vit" if ccfg.is_vit else "rn")
    mask = build_lock_mask(
        params,
        vision_layers=(ccfg.vision_layers
                       if (ccfg.is_vit or tower == "convnext") else 0),
        text_layers=ccfg.transformer_layers,
        # LoRA: every base param freezes (adapters are the trainables)
        unlocked_groups=0 if cfg.lora_rank > 0 else unlocked_groups,
        tune_text=cfg.tune_text and cfg.lora_rank == 0,
        unlocked_text_layers=unlocked_text_layers,
        is_vit=ccfg.is_vit,
        tower=tower,
    )
    if fsdp and cfg.fused_prefix != 0:
        if verbose:
            print("[peft] fused_prefix disabled under fsdp "
                  "(the fused prefix assumes replicated weights)")
        cfg = dataclasses.replace(cfg, fused_prefix=0)
    if cfg.fused_prefix < 0:
        from ..models.fast_vit import peft_fused_prefix_len

        cfg = dataclasses.replace(
            cfg, fused_prefix=peft_fused_prefix_len(
                ccfg, unlocked_groups, mesh,
                batch_size=train_view.batch_size))
        if verbose and cfg.fused_prefix:
            n_blocks_v = (sum(ccfg.vision_layers)
                          if getattr(ccfg, "vision_tower", "") == "convnext"
                          else ccfg.vision_layers)
            print(f"[peft] fused frozen-prefix forward: bottom "
                  f"{cfg.fused_prefix}/{n_blocks_v} visual blocks "
                  "run the forward-only "
                  + ("int8 " if cfg.prefix_quant else "")
                  + "Pallas kernels"
                  + (" (shard_mapped over the data axis)"
                     if mesh is not None else ""))
    elif cfg.fused_prefix > 0:
        # explicit fused_prefix from config: every hybrid-prefix block must
        # actually be frozen — a trainable block inside the prefix would get
        # its gradients silently zeroed by the stop_gradient (bf16 path) or
        # crash on a missing frozen leaf (int8 path)
        is_convnext = getattr(ccfg, "vision_tower", "") == "convnext"
        n_blocks = (sum(ccfg.vision_layers) if is_convnext
                    else ccfg.vision_layers)
        max_prefix = max(0, n_blocks + 1 - unlocked_groups)
        if not (ccfg.is_vit or is_convnext):
            raise ValueError(
                "finetune.fused_prefix > 0 requires a ViT-family or "
                "ConvNeXt vision tower (the RN tower has no fused-prefix "
                "hybrid)")
        if cfg.fused_prefix > max_prefix:
            raise ValueError(
                f"finetune.fused_prefix={cfg.fused_prefix} exceeds the "
                f"frozen bottom depth ({max_prefix} blocks at "
                f"unlocked_groups={unlocked_groups}); the prefix must be "
                "entirely frozen")
    if cfg.lora_rank > 0:
        from .lora import lora_init, lora_param_count

        towers = ("visual", "text") if cfg.tune_text else ("visual",)
        trainable = lora_init(params, cfg.lora_rank,
                              jax.random.key(seed + 7919),
                              towers=towers, include_mlp=cfg.lora_mlp)
        frozen = params
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel import shard_params

            # adapters replicate explicitly (tiny; their joined '/'-keys
            # would confuse shard_params' path rules); the frozen base
            # follows the DP/FSDP placement rules
            rep = NamedSharding(mesh, PartitionSpec())
            trainable = jax.tree_util.tree_map(
                lambda t: jax.device_put(t, rep), trainable)
            frozen = shard_params(mesh, frozen, fsdp=fsdp)
        report = trainable_report(mask)
        report.update({
            "method": "lora",
            "lora_rank": cfg.lora_rank,
            "lora_alpha": cfg.lora_alpha,
            "num_adapted_kernels": len(trainable),
            "num_trainable": 2 * len(trainable),
            "lora_params": lora_param_count(trainable),
        })
        if verbose:
            print(f"LoRA r={cfg.lora_rank} alpha={cfg.lora_alpha}: "
                  f"{len(trainable)} adapted kernels, "
                  f"{report['lora_params']:,} trainable params "
                  f"(base tower fully frozen)")
    else:
        trainable, frozen = partition_params(params, mask)
        # own the trainable buffers: every step regime donates (trainable,
        # opt_state), and partition_params returns views into the CALLER's
        # param tree — without this copy the first donated step deletes
        # the caller's arrays out from under it
        trainable = jax.tree.map(lambda a: jnp.array(a), trainable)
        if mesh is not None:
            from ..parallel import shard_params

            trainable = shard_params(mesh, trainable, fsdp=fsdp)
            frozen = shard_params(mesh, frozen, fsdp=fsdp)
        report = trainable_report(mask)
        if verbose:
            print(f"Trainable params: {report['num_trainable']} "
                  f"({report['fraction_trainable']:.1%})")
            print(f"Frozen params   : {report['num_frozen']}")
            for top, cnt in sorted(report["by_top_module"].items()):
                print(f"  {top}: {cnt} params")

    if cfg.tune_text and prompt_tokens is None:
        raise ValueError("tune_text=True requires prompt_tokens")
    if not cfg.tune_text and text_weights is None:
        raise ValueError("tune_text=False requires precomputed text_weights")

    use_chunked = (isinstance(cfg.device_dataset, str)
                   and cfg.device_dataset.lower() == "chunked")
    use_scan = bool(cfg.device_dataset) and not use_chunked
    if mesh is not None and (use_scan or use_chunked):
        if verbose:
            print("[peft] device_dataset disabled under a mesh "
                  "(per-step SPMD loop instead)")
        use_scan = use_chunked = False
    if use_scan:
        opt, epoch_fn = make_epoch_scan(model, cfg, text_weights,
                                        prompt_tokens)
        # stage the train split in HBM once (view-relative ordering)
        images_all = jnp.asarray(
            train_view.dataset.images[train_view.indices])
        labels_all = jnp.asarray(train_view.labels.astype(np.int32))
        step = None
    elif use_chunked:
        opt, epoch_fn = make_epoch_scan(model, cfg, text_weights,
                                        prompt_tokens)
        labels_view = train_view.labels.astype(np.int32)
        bytes_per_sample = int(
            np.prod(train_view.dataset.images.shape[1:]))
        chunk_steps = max(1, int(cfg.device_chunk_bytes)
                          // (bytes_per_sample * train_view.batch_size))
        step = None
    else:
        opt, step = make_train_step(model, cfg, text_weights,
                                    prompt_tokens, mesh=mesh, donate=True)
    opt_state = opt.init(trainable)

    start_epoch = 0
    if resume_from is not None:
        from pathlib import Path

        from ..utils import load_checkpoint

        restored = load_checkpoint(Path(resume_from), params, opt_state)
        trainable, frozen = partition_params(restored["params"], mask)
        # donation safety (see above): never donate the restored tree's own
        # buffers
        trainable = jax.tree.map(lambda a: jnp.array(a), trainable)
        if "opt_state" in restored:
            # restored onto the opt.init target, so shardings carry over
            opt_state = restored["opt_state"]
        if mesh is not None:
            from ..parallel import shard_params

            trainable = shard_params(mesh, trainable, fsdp=fsdp)
            frozen = shard_params(mesh, frozen, fsdp=fsdp)
            if "opt_state" in restored:
                # the checkpoint restore can land leaves on the default
                # device; re-place them to match a freshly initialized
                # state over the (re-sharded) trainable — without this a
                # multi-process resume feeds the jitted step a
                # device-0-only Adam state next to globally sharded
                # params ("incompatible devices", caught by
                # tests/test_multiprocess_distributed.py elastic test)
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as _P

                rep = NamedSharding(mesh, _P())
                ref = opt.init(trainable)

                def _replace(a, r):
                    if not isinstance(r, jax.Array):
                        return a
                    # mesh-placed template leaves (Adam moments) keep
                    # their placement; scalar leaves (count) are fresh
                    # uncommitted arrays in a normal init — replicate
                    sh = (r.sharding if isinstance(r.sharding,
                                                   NamedSharding) else rep)
                    return jax.device_put(np.asarray(a), sh)

                opt_state = jax.tree.map(_replace, opt_state, ref)
        start_epoch = int(restored["meta"].get("epoch", 0))
        if verbose:
            print(f"[resume] restored epoch {start_epoch} "
                  f"(params{' + opt state' if 'opt_state' in restored else ''})"
                  f" from {resume_from}")

    # int8/packed prefix: quantize ONCE per run, after any resume
    # re-partition (the frozen tree never changes during training).  All
    # regimes receive it as an argument — the chunked regime in particular
    # calls epoch_fn n_chunks times per epoch, so computing in-jit there
    # would requantize the frozen tower per chunk.
    qprefix = None
    pprefix = None
    if cfg.fused_prefix > 0:
        if cfg.prefix_quant:
            qprefix = jax.jit(partial(_quantize_prefix, model, cfg))(frozen)
        else:
            pprefix = jax.jit(partial(_pack_prefix, model, cfg))(frozen)

    def current_text_weights(par) -> jax.Array:
        if cfg.tune_text:
            return compute_text_weights(model, par, prompt_tokens,
                                        cfg.num_classes, cfg.num_templates,
                                        scan_blocks=cfg.scan_blocks)
        return text_weights

    eval_step = make_eval_step(model, cfg.resolution, cfg.num_classes,
                               cfg.compute_dtype, project=True, mesh=mesh,
                               sharded_weights=fsdp,
                               scan_blocks=cfg.scan_blocks)

    def run_eval(view, **kw):
        par = _merge_for_step(cfg, trainable, frozen)
        return evaluate(model, par, view, current_text_weights(par),
                        cfg.resolution, cfg.num_classes,
                        compute_dtype=cfg.compute_dtype, eval_step=eval_step,
                        mesh=mesh, **kw)

    base_key = jax.random.key(seed)
    val_metrics = None
    timer = None

    # graceful preemption: on SIGTERM/SIGINT finish the current epoch,
    # checkpoint (when periodic checkpointing is wired), and return —
    # paired with ``resume_from``/``finetune.resume`` this gives elastic
    # recovery across TPU preemptions.  Signal handlers only install on
    # the main thread; elsewhere (tests, servers) the flag stays False.
    interrupted = {"flag": False, "epoch": None}
    prev_handlers = {}
    try:
        import signal
        import threading

        if threading.current_thread() is threading.main_thread():
            def _on_signal(signum, frame):
                interrupted["flag"] = True
                print(f"[peft] signal {signum}: finishing the current "
                      "epoch, then checkpointing and exiting")

            for sig in (signal.SIGTERM, signal.SIGINT):
                prev_handlers[sig] = signal.signal(sig, _on_signal)
    except (ValueError, OSError):
        prev_handlers = {}

    if verbose:
        print("\nStart Training procedure")
    first_epoch = start_epoch
    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.perf_counter()
        lr_e = cosine_lr(cfg.lr, epoch, cfg.epochs)
        run_loss, run_batches, correct, seen = 0.0, 0, 0.0, 0.0
        ekey = jax.random.fold_in(base_key, epoch)

        profiling = profile_dir is not None and epoch == first_epoch
        if profiling:
            jax.profiler.start_trace(profile_dir)
        if epoch == first_epoch:
            from ..utils.profiling import StepTimer

            timer = StepTimer()

        if use_scan:
            idx, valid = _epoch_batch_indices(train_view, epoch)
            trainable, opt_state, m = epoch_fn(
                trainable, frozen, opt_state, images_all, labels_all,
                jnp.asarray(idx), jnp.asarray(valid), ekey, lr_e,
                jnp.asarray(0, jnp.int32), qprefix, pprefix)
            run_loss = float(m["loss_sum"])
            run_batches = int(m["batches"])
            correct = float(m["correct"])
            seen = float(m["n_valid"])
            if timer is not None:
                timer.tick(items=int(seen))
        elif use_chunked:
            idx, valid = _epoch_batch_indices(train_view, epoch)
            steps = idx.shape[0]
            n_chunks = (steps + chunk_steps - 1) // chunk_steps

            def stage(c):
                """Host-gather + async-upload chunk c's samples; the batch
                indices become chunk-local row numbers."""
                s0 = c * chunk_steps
                s1 = min(s0 + chunk_steps, steps)
                rel = idx[s0:s1].reshape(-1)           # view-relative rows
                abs_rows = train_view.indices[rel]     # (pad rows repeat,
                imgs = jax.device_put(                 #  masked by valid)
                    np.ascontiguousarray(train_view.dataset.images[abs_rows]))
                labs = jax.device_put(labels_view[rel])
                n_local = s1 - s0
                bidx = np.arange(n_local * train_view.batch_size,
                                 dtype=np.int32).reshape(
                                     n_local, train_view.batch_size)
                return imgs, labs, jnp.asarray(bidx), \
                    jnp.asarray(valid[s0:s1]), s0

            metrics_parts = []
            buf = stage(0)
            for c in range(n_chunks):
                imgs, labs, bidx, bvalid, s0 = buf
                trainable, opt_state, m = epoch_fn(
                    trainable, frozen, opt_state, imgs, labs, bidx, bvalid,
                    ekey, lr_e, jnp.asarray(s0, jnp.int32), qprefix, pprefix)
                # prefetch the next chunk while this one computes on device
                if c + 1 < n_chunks:
                    buf = stage(c + 1)
                metrics_parts.append(m)
            run_loss = float(sum(m["loss_sum"] for m in metrics_parts))
            run_batches = int(sum(m["batches"] for m in metrics_parts))
            correct = float(sum(m["correct"] for m in metrics_parts))
            seen = float(sum(m["n_valid"] for m in metrics_parts))
            if timer is not None:
                timer.tick(items=int(seen))
        else:
            # keep step metrics on device until the epoch ends: float()-ing
            # per batch would block the host on every step and serialize
            # dispatch with device compute (~100 ms/round-trip through the
            # remote tunnel — the only regime available under a mesh)
            step_metrics = []
            for bi, batch in enumerate(train_view.batches(epoch=epoch)):
                key = jax.random.fold_in(ekey, bi)
                imgs = jnp.asarray(batch.images)
                labs = jnp.asarray(batch.labels)
                val = jnp.asarray(batch.valid)
                if mesh is not None:
                    from ..parallel import shard_batch

                    imgs, labs, val = shard_batch(mesh, imgs, labs, val)
                with jax.profiler.StepTraceAnnotation("train_step",
                                                      step_num=bi):
                    trainable, opt_state, m = step(
                        trainable, frozen, opt_state, imgs, labs, val,
                        key, lr_e, qprefix, pprefix)
                step_metrics.append(m)
                run_batches += 1
                if timer is not None:
                    timer.tick(items=batch.n_valid)
                if profiling and bi >= 4:
                    jax.profiler.stop_trace()
                    profiling = False
                    if verbose:
                        print(f"[profile] trace (5 steps) -> {profile_dir}")
            if step_metrics:
                run_loss = float(jnp.sum(
                    jnp.stack([m["loss"] for m in step_metrics])))
                correct = float(jnp.sum(
                    jnp.stack([m["correct"] for m in step_metrics])))
                seen = float(jnp.sum(
                    jnp.stack([m["n_valid"] for m in step_metrics])))
        if profiling:
            jax.profiler.stop_trace()

        if verbose:
            print(f"Train Epoch: {epoch + 1} / {cfg.epochs}  "
                  f"Acc: {correct / max(seen, 1):.4f} "
                  f"({int(correct)}/{int(seen)}), "
                  f"Avg Loss: {run_loss / max(run_batches, 1):.4f}, "
                  f"LR: {lr_e:.2e}, "
                  f"{time.perf_counter() - t0:.1f}s")
        if logger is not None:
            logger.log({"epoch": epoch + 1, "train_loss": run_loss / max(run_batches, 1),
                        "train_acc": correct / max(seen, 1), "lr": lr_e})

        do_val = ((cfg.val_interval and (epoch + 1) % cfg.val_interval == 0)
                  or (epoch + 1) == cfg.epochs)
        if do_val:
            if val_view is not None and val_view.num_samples > 0:
                val_metrics = run_eval(val_view, l2_eval_ctx=l2_eval_ctx)
                if verbose:
                    print(f"[val epoch {epoch + 1}] "
                          f"loss={val_metrics['loss']:.4f}, "
                          f"top1_acc={val_metrics['top1']:.4f}, "
                          f"top3_acc={val_metrics['top3']:.4f}, "
                          f"f1={val_metrics['f1']:.4f}, "
                          f"mcc={val_metrics['mcc']:.4f}")
                    if val_metrics.get("l2"):
                        l2 = val_metrics["l2"]
                        print(f"[val epoch {epoch + 1} L2] " + ", ".join(
                            f"{k}={v:.4f}" for k, v in l2.items()
                            if isinstance(v, float)))
                if logger is not None:
                    logger.log({f"val_{k}": v for k, v in val_metrics.items()
                                if isinstance(v, (int, float))})
            elif verbose:
                print(f"[val epoch {epoch + 1}] skipped (no val split)")

        if (checkpoint_fn is not None and cfg.checkpoint_interval
                and (epoch + 1) % cfg.checkpoint_interval == 0
                and (epoch + 1) < cfg.epochs):
            checkpoint_fn(_merge_for_step(cfg, trainable, frozen),
                          opt_state, epoch + 1)

        if interrupted["flag"]:
            interrupted["epoch"] = epoch + 1
            if checkpoint_fn is not None and not (
                    cfg.checkpoint_interval
                    and (epoch + 1) % cfg.checkpoint_interval == 0):
                checkpoint_fn(_merge_for_step(cfg, trainable, frozen),
                              opt_state, epoch + 1)
            if verbose:
                print(f"[peft] interrupted after epoch {epoch + 1}; "
                      "resume with finetune.resume: true")
            break

    for sig, h in prev_handlers.items():
        import signal

        signal.signal(sig, h)

    # final test
    test_metrics = None
    tracker = ClassificationTracker() if track_test else None
    if test_view is not None and test_view.num_samples > 0:
        test_metrics = run_eval(
            test_view, return_confusion_matrix=return_confusion_matrix,
            l2_eval_ctx=l2_eval_ctx, tracker=tracker)
        if verbose:
            print(f"[test] loss={test_metrics['loss']:.4f}, "
                  f"top1_acc={test_metrics['top1']:.4f}, "
                  f"top3_acc={test_metrics['top3']:.4f}, "
                  f"f1={test_metrics['f1']:.4f}, mcc={test_metrics['mcc']:.4f}")
            if test_metrics.get("l2"):
                print("[test L2] " + ", ".join(
                    f"{k}={v:.4f}" for k, v in test_metrics["l2"].items()
                    if isinstance(v, float)))
    elif verbose:
        print("[test] skipped (no test split)")

    final_params = _merge_for_step(cfg, trainable, frozen)
    if timer is not None:
        report["first_epoch_throughput"] = timer.summary()
    return {
        "val": val_metrics,
        "test": test_metrics,
        "params": final_params,
        "opt_state": opt_state,
        "tracker": tracker,
        "report": report,
        "mask": mask,
        "adapters": trainable if cfg.lora_rank > 0 else None,
        "interrupted_at_epoch": interrupted["epoch"],
    }
