"""Fast SigLIP encode path: head-group-split whole-block attention.

A pure function over the canonical ``SigLIPModel`` param tree (same
checkpoints, same numerics contract as `models/siglip.py`, which covers
the reference's default backbone — `/root/reference/configs/base.yaml:33`).

The winning recipe (measured same-session A/B/A, v5e, SO400M-384 b64,
eval preprocessing included — PERF_NOTES.md):

  * patchify as an explicit reshape + matmul (+ conv bias);
  * the whole attention half — LN1 + packed QKV + MHA + out-proj +
    residual — as ONE Pallas kernel per (image, head-group)
    (``ops/block_kernel.attn_block_split``): the unsplit whole-block
    kernel exceeds VMEM at S=736/W=1152, so the QKV weights are
    column-sliced per 2-head group, the out-proj row-sliced, partials
    accumulated in f32 VMEM scratch, and LN(x) computed once per image
    (persisted in scratch across the group iterations);
  * the MLP half runs the hidden-dim-split whole-block kernel
    (``ops/block_kernel.mlp_block_split``, 2 chunks of 9.9 MB bf16 each)
    — it LOST next to XLA-attention blocks (17.1 vs 14.8 ms/block) but
    WINS next to the split-attention kernel (231.9 vs 237.2 ms tower,
    same-session) — kernel verdicts are context-dependent, always re-A/B
    after changing the adjacent kernels (PERF_NOTES.md);
  * ln_post + MAP pooling head stay on the canonical Flax module (one
    probe token — negligible).

Measured: 238.7 ms vs 287.6/289.5 ms canonical -> 268 vs 223/221 img/s
(+20%).  (An earlier per-op fused path — ln_matmul/matmul_residual
chains — measured 344.5 ms, i.e. SLOWER than canonical; this file
replaces it with the split-whole-block recipe.)

``siglip_encode_fast`` is forward-only (encode/serving).  PEFT training
with frozen bottom blocks uses ``siglip_encode_hybrid`` (fused forward
prefix + canonical differentiable suffix); full training keeps the Flax
module.  Equivalence is tested against ``SigLIPModel.encode_image``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.block_kernel import (
    attn_block_split,
    mlp_block_split,
    regroup_attn_weights_f,
)
from .siglip import MAPHead, SigLIPConfig, gelu_tanh

LN_EPS = 1e-6


def _ln(x, scale, bias, eps=LN_EPS):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def siglip_attn_groups(config: SigLIPConfig, hybrid: bool = False) -> int:
    """Heads per program by tower width (r4 ladder, SigLIP-L-16-384 b32:
    1/2/4/8/16 heads-per-group -> 325/380/390/396/396 img/s — wider
    groups amortize the per-program LN/QKV work until VMEM pushes back):

      * width <= 1024 (B/L towers): 8 heads/program (encode); the PEFT
        hybrid prefix caps at 4 — inside the train step the jvp-wrapped
        kernel's scoped VMEM measured 17.09M > the 16M limit at 8 hpg
        (SigLIP-L b16@384 compile failure, r5), and the encode ladder
        priced 4 hpg at only ~1.5% (390 vs 396 img/s)
      * wider (SO400M W=1152): 2 heads/program — 4+ is a measured
        Mosaic compile failure at S=576 (r3, re-confirmed r4)

    1 head/program for head counts the grouping does not divide (a
    single UNSPLIT group would hand the kernel the whole-tower working
    set this split exists to avoid).  ``AIHAB_SIGLIP_HPG`` overrides
    for A/B."""
    import os

    heads = config.vision_heads
    hpg = int(os.environ.get("AIHAB_SIGLIP_HPG", "0"))
    if hpg > 0 and heads % hpg == 0:
        return heads // hpg
    hpg = (4 if hybrid else 8) if config.vision_width <= 1024 else 2
    while hpg > 1 and heads % hpg:
        hpg //= 2
    return heads // hpg if heads % hpg == 0 else heads


def pack_siglip_fast_params(params: Dict, config: SigLIPConfig,
                            dtype=jnp.bfloat16, *, start: int = 0,
                            stop: Optional[int] = None,
                            hybrid: bool = False) -> Dict:
    """One-time regrouping of the separate q/k/v projections into
    per-head-group tensors for the split whole-block attention kernel.
    Done at load time so the packing never re-runs inside the jitted
    encode; pass the result through a JIT ARGUMENT (arrays only — safe
    to trace).  ``start``/``stop`` restrict packing to a block range
    (the PEFT hybrid packs only its frozen prefix; ``hybrid`` selects
    its more conservative head grouping — see siglip_attn_groups)."""
    n_groups = siglip_attn_groups(config, hybrid)
    vp = params["visual"]
    packed: Dict = {}
    for i in range(start, config.vision_layers if stop is None else stop):
        blk = vp["transformer"][f"resblocks_{i}"]
        w = jnp.concatenate(
            [jnp.asarray(blk["attn"][n]["kernel"], dtype)
             for n in ("q_proj", "k_proj", "v_proj")], axis=1)
        b = jnp.concatenate(
            [jnp.asarray(blk["attn"][n]["bias"], jnp.float32)
             for n in ("q_proj", "k_proj", "v_proj")])
        wout = jnp.asarray(blk["attn"]["out_proj"]["kernel"], dtype)
        wg, bg, og = regroup_attn_weights_f(w, b, wout,
                                            config.vision_heads, n_groups)
        packed[f"resblocks_{i}"] = {"wqkv_g": wg, "b_qkv_g": bg,
                                    "wout_g": og}
    return packed


def _siglip_embed(vp, images: jax.Array, config: SigLIPConfig, dtype):
    """Patchify as reshape + matmul (+ conv bias) + position embedding —
    plain jnp, numerically the canonical tower's stem."""
    p = config.patch_size
    width = config.vision_width
    x = images.astype(dtype)
    b, h, w, c = x.shape
    gh, gw = h // p, w // p
    patches = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, gh * gw, p * p * c)
    kernel2d = jnp.asarray(vp["conv1"]["kernel"], dtype).reshape(
        p * p * c, width)
    x = patches @ kernel2d + jnp.asarray(vp["conv1"]["bias"], dtype)
    return x + jnp.asarray(vp["positional_embedding"], dtype)


def _siglip_mlp_chunks(config: SigLIPConfig, dtype) -> int:
    """Fewest MLP hidden-dim chunks whose weight pair fits the one-kernel
    VMEM budget (SO400M: 19.8 MB bf16 -> 2 chunks; SigLIP-B16: 9.4 MB
    -> 1); the chunk count must divide the hidden dim exactly."""
    from .fast_vit import MLP_WHOLE_KERNEL_MAX_BYTES

    hidden = config.vision_mlp_dim
    width = config.vision_width
    pair_bytes = 2 * width * hidden * jnp.dtype(dtype).itemsize
    fit = next(
        (n for n in (1, 2, 3, 4, 6, 8)
         if hidden % n == 0 and pair_bytes // n <= MLP_WHOLE_KERNEL_MAX_BYTES),
        None)
    if fit is not None:
        return fit
    # nothing fits the budget: take the largest divisor <= 8 (the
    # smallest per-chunk weight pair we can reach) — Mosaic's real
    # liveness repeatedly measures below the naive estimate, so this
    # degrades gracefully instead of guessing 2
    return max((n for n in (8, 6, 4, 3, 2, 1) if hidden % n == 0),
               default=1)


def _apply_fused_siglip_blocks(vp, packed, x, config: SigLIPConfig, dtype,
                               *, start: int, stop: int,
                               interpret: bool = False):
    """Transformer blocks [start, stop) through the split-whole-block
    Pallas dispatch (forward-only)."""
    heads = config.vision_heads
    width = config.vision_width
    # grouping comes from the PACKED tensors (leading axis = n_groups),
    # so pack-time and apply-time can never disagree (r5: the hybrid
    # prefix packs a different grouping than encode)
    n_groups = int(packed[f"resblocks_{start}"]["wqkv_g"].shape[0])
    mlp_chunks = _siglip_mlp_chunks(config, dtype)
    b, s, _ = x.shape
    for i in range(start, stop):
        blk = vp["transformer"][f"resblocks_{i}"]
        pk = packed[f"resblocks_{i}"]
        x = attn_block_split(
            x, pk["wqkv_g"], pk["b_qkv_g"], pk["wout_g"],
            blk["attn"]["out_proj"]["bias"],
            blk["ln_1"]["scale"], blk["ln_1"]["bias"],
            heads, n_groups, ln_eps=LN_EPS, interpret=interpret)
        x2 = mlp_block_split(
            x.reshape(b * s, width),
            blk["ln_2"]["scale"], blk["ln_2"]["bias"],
            jnp.asarray(blk["mlp"]["c_fc"]["kernel"], dtype),
            blk["mlp"]["c_fc"]["bias"],
            jnp.asarray(blk["mlp"]["c_proj"]["kernel"], dtype),
            blk["mlp"]["c_proj"]["bias"],
            n_chunks=mlp_chunks, act="gelu_tanh", ln_eps=LN_EPS,
            interpret=interpret)
        x = x2.reshape(b, s, width)
    return x


def _map_pool(vp, x, config: SigLIPConfig, dtype):
    tokens = _ln(x, vp["ln_post"]["scale"], vp["ln_post"]["bias"])
    return MAPHead(config.vision_heads, config.vision_mlp_dim, dtype=dtype,
                   param_dtype=jnp.float32, name=None).apply(
        {"params": vp["attnpool"]}, tokens)


def siglip_encode_fast(params: Dict, images: jax.Array,
                       config: SigLIPConfig, *, project: bool = False,
                       dtype=jnp.bfloat16,
                       packed: Optional[Dict] = None,
                       interpret: bool = False):
    """images: [B, H, W, 3] normalized NHWC -> pooled SigLIP embedding
    (or (pooled, pooled) with project=True; SigLIP has no separate
    vision projection)."""
    vp = params["visual"]
    if packed is None:
        packed = pack_siglip_fast_params(params, config, dtype)
    x = _siglip_embed(vp, images, config, dtype)
    x = _apply_fused_siglip_blocks(vp, packed, x, config, dtype, start=0,
                                   stop=config.vision_layers,
                                   interpret=interpret)
    pooled = _map_pool(vp, x, config, dtype)
    if project:
        return pooled, pooled
    return pooled


def _canonical_siglip_block(x, blk, heads: int, dtype):
    """One differentiable SigLIP transformer block in plain jnp,
    numerically identical to the Flax ``SigLIPBlock`` (fp32 LN eps 1e-6,
    separate q/k/v projections, tanh-GELU, same attention dispatch)."""
    from ..ops.attention import attention

    ln1 = _ln(x, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
    proj = lambda t, p: (t @ jnp.asarray(p["kernel"], dtype)  # noqa: E731
                         + jnp.asarray(p["bias"], dtype))
    q = proj(ln1, blk["attn"]["q_proj"])
    k = proj(ln1, blk["attn"]["k_proj"])
    v = proj(ln1, blk["attn"]["v_proj"])
    out = attention(q, k, v, heads)
    x = x + proj(out, blk["attn"]["out_proj"])
    ln2 = _ln(x, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
    h = gelu_tanh(proj(ln2, blk["mlp"]["c_fc"]))
    return x + proj(h, blk["mlp"]["c_proj"])


def stack_block_params(vp: Dict, start: int, stop: int) -> Dict:
    """Stack the per-block param trees ``resblocks_[start, stop)`` along a
    leading layer axis (every SigLIP block has identical shapes), for
    ``canonical_blocks_scan``.  Host-side / outside-jit: do it once and
    pass the stacked tree as a jit argument."""
    blocks = [vp["transformer"][f"resblocks_{i}"] for i in range(start, stop)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def canonical_blocks_scan(x: jax.Array, stacked: Dict, heads: int, dtype,
                          remat: bool = False):
    """Apply a stack of canonical SigLIP blocks via ``lax.scan`` — the
    same math as the unrolled loop, but the compiled program contains ONE
    block body instead of L copies.  Cuts compile time ~L-fold for deep
    towers (the unrolled canonical SO400M train graph compiled in 1484 s)
    and gives XLA a loop to schedule instead of a 27-block straight-line
    region; differentiable (scan has a native VJP).

    ``remat=True`` checkpoints the body (recompute-in-backward).  Besides
    the usual activation-memory saving this is a WORKAROUND for an
    XLA:TPU compiler crash: grad-of-scan over the SO400M body at
    [B>=16, S=576, W=1152] kills the compiler subprocess (b8 compiles,
    b16 crashes; fused OR plain XLA attention; bisected in
    `tools_dev/repro_scan_crash.py`) — the remat'd backward structure
    compiles at the same shapes.  Train paths pass remat=True; the
    forward-only encode paths don't need it (they compile un-remat'd)."""
    def body(h, bp):
        return _canonical_siglip_block(h, bp, heads, dtype), None

    x, _ = jax.lax.scan(jax.checkpoint(body) if remat else body, x, stacked)
    return x


def siglip_encode_scan(params: Dict, images: jax.Array,
                       config: SigLIPConfig, *, project: bool = False,
                       dtype=jnp.bfloat16,
                       stacked: Optional[Dict] = None,
                       remat: bool = False):
    """Canonical SigLIP encode with the block stack under ``lax.scan``
    (numerically the module tower; see ``canonical_blocks_scan``).
    Pass ``remat=True`` when this encode sits under ``jax.grad`` (train
    steps) — see the scan-crash workaround note on
    ``canonical_blocks_scan``."""
    vp = params["visual"]
    if stacked is None:
        stacked = stack_block_params(vp, 0, config.vision_layers)
    x = _siglip_embed(vp, images, config, dtype)
    x = canonical_blocks_scan(x, stacked, config.vision_heads, dtype,
                              remat=remat)
    pooled = _map_pool(vp, x, config, dtype)
    if project:
        return pooled, pooled
    return pooled


def siglip_text_scan(params: Dict, tokens: jax.Array, config: SigLIPConfig,
                     *, dtype=jnp.bfloat16, stacked: Optional[Dict] = None):
    """Canonical SigLIP text encode (-> (pre, projected), the
    ``SigLIPTextTower`` contract) with the block stack under ``lax.scan``
    — the text blocks share the vision blocks' structure, so the same
    scanned body applies.  tune_text PEFT re-encodes the whole prompt
    ensemble inside every train step; at SO400M depth (27 text blocks)
    the unrolled re-encode doubles the compiled program size."""
    tp = params["text"]
    if stacked is None:
        stacked = stack_block_params(tp, 0, config.text_layers)
    x = jnp.asarray(tp["token_embedding"])[tokens].astype(dtype)
    x = x + jnp.asarray(tp["positional_embedding"], dtype)
    x = canonical_blocks_scan(x, stacked, config.text_heads, dtype)
    x = _ln(x, tp["ln_final"]["scale"], tp["ln_final"]["bias"])
    pre = x[:, -1, :]  # SigLIP pools the LAST token (fixed-pad inputs)
    projected = (pre @ jnp.asarray(tp["head"]["kernel"], dtype)
                 + jnp.asarray(tp["head"]["bias"], dtype))
    return pre, projected


def siglip_encode_hybrid(params: Dict, images: jax.Array,
                         config: SigLIPConfig, n_prefix: int, *,
                         project: bool = False, dtype=jnp.bfloat16,
                         interpret: bool = False, mesh=None, qprefix=None,
                         packed_prefix=None):
    """PEFT-training encode: fused forward-only Pallas kernels for the
    ``n_prefix`` FROZEN bottom blocks, canonical differentiable math for
    the trainable suffix + MAP pooling head (mirrors
    ``fast_vit.vit_encode_hybrid``; dispatch gate
    ``fast_vit.peft_fused_prefix_len``).  ``stop_gradient`` goes on the
    fused region's INPUTS — the kernels have no JVP rule, and JAX
    linearizes any op whose inputs carry tangents even if the cotangent
    is later zero.  Under a pure data-parallel ``mesh`` the fused prefix
    runs per shard via ``shard_map``; the suffix stays GSPMD-partitioned.

    ``qprefix`` ({resblocks_i: quantize_siglip_block(...)}) switches the
    frozen prefix to the int8 recipe (split whole-block attention +
    chained int8 MLP — opt-in: ``finetune.fused_prefix_quant``)."""
    vp = params["visual"]
    x = _siglip_embed(vp, images, config, dtype)
    if n_prefix > 0:
        from .fast_vit import _shard_mapped_prefix

        x_sg = jax.lax.stop_gradient(x)
        if qprefix is not None:
            from .quant_siglip import apply_int8_siglip_blocks

            w_sg = jax.lax.stop_gradient(qprefix)

            def prefix_fn(w, xs):
                return apply_int8_siglip_blocks(
                    w, xs, config, start=0, stop=n_prefix,
                    use_pallas=True, use_split_attn=True,
                    interpret=interpret)
        elif packed_prefix is not None:
            # prefix weights pre-packed ONCE by the caller (invariant
            # across steps — packing in-step costs ~16 MB of weight
            # reshuffling per block per step)
            w_sg = jax.lax.stop_gradient((vp, packed_prefix))

            def prefix_fn(w, xs):
                vpw, packed = w
                return _apply_fused_siglip_blocks(
                    vpw, packed, xs, config, dtype, start=0, stop=n_prefix,
                    interpret=interpret)
        else:
            w_sg = jax.lax.stop_gradient(vp)

            def prefix_fn(w, xs):
                packed = pack_siglip_fast_params({"visual": w}, config,
                                                 dtype, stop=n_prefix,
                                                 hybrid=True)
                return _apply_fused_siglip_blocks(
                    w, packed, xs, config, dtype, start=0, stop=n_prefix,
                    interpret=interpret)

        if mesh is not None:
            x = _shard_mapped_prefix(prefix_fn, w_sg, x_sg, mesh)
        else:
            x = prefix_fn(w_sg, x_sg)
        x = x.astype(dtype)
    for i in range(n_prefix, config.vision_layers):
        blk = vp["transformer"][f"resblocks_{i}"]
        x = _canonical_siglip_block(x, blk, config.vision_heads, dtype)
    pooled = _map_pool(vp, x, config, dtype)
    if project:
        return pooled, pooled
    return pooled
