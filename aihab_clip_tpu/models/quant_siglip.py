"""int8 (W8A8 dynamic) SigLIP vision-tower encode path for serving.

Applies the measured quantization recipe from ``quant_vit`` to the SigLIP
layout (separate q/k/v projections, gelu_tanh MLP, LN eps 1e-6, MAP
pooling head — `models/siglip.py`, which is parity-tested against HF
``SiglipModel``):

  * q/k/v are PACKED into one [W, 3W] int8 GEMM fused with the ln_1
    prologue (one VMEM pass over the tokens instead of three);
  * attn out_proj: fused W8A8 with residual epilogue;
  * MLP: chained int8 — LN2 + c_fc + gelu_tanh requantizes its output
    (the widest activation moves at 1 byte/elem) and c_proj consumes it
    with no quantize pass;
  * patchify conv: im2col int8 matmul + bias;
  * ln_post and the MAP head stay high-precision (tiny, one query token);
  * self-attention keeps the measured dispatcher (the head-batched fused
    kernel at SigLIP's S=729).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..backend import dispatch_backend

from ..ops.attention import attention
from ..ops.quant import quant_dense
from ..ops.quant_matmul import (
    quant_matmul_fused,
    quant_matmul_fused_qout,
    quant_matmul_q8in,
)
from .quant_vit import _ln
from .siglip import MAPHead, SigLIPConfig

LN_EPS = 1e-6


def quantize_siglip_block(blk: Dict, heads: int = 0,
                          n_groups: int = 0) -> Dict:
    """Quantize one SigLIP transformer block's GEMM weights (jnp ops —
    load time or in-jit; the separate q/k/v projections are PACKED into
    one [W, 3W] GEMM sharing the ln_1(x) input).

    When ``heads``/``n_groups`` are given, the head-group regrouping for
    the split whole-block attention kernel is ALSO done here, once —
    regrouping inside the encode/train step would reshuffle the full
    QKV+out-proj weight set per block per call (qblocks are jit
    arguments, so nothing constant-folds)."""
    from ..ops.quant import quantize_weight

    q: Dict = {}
    wq = jnp.asarray(blk["attn"]["q_proj"]["kernel"], jnp.float32)
    wk = jnp.asarray(blk["attn"]["k_proj"]["kernel"], jnp.float32)
    wv = jnp.asarray(blk["attn"]["v_proj"]["kernel"], jnp.float32)
    w8, ws = quantize_weight(jnp.concatenate([wq, wk, wv], axis=1))
    q["attn/qkv"] = {
        "w8": w8, "scale": ws,
        "bias": jnp.concatenate([
            jnp.asarray(blk["attn"][n]["bias"], jnp.float32)
            for n in ("q_proj", "k_proj", "v_proj")]),
    }
    for mod, name in (("attn", "out_proj"), ("mlp", "c_fc"),
                      ("mlp", "c_proj")):
        w8, ws = quantize_weight(blk[mod][name]["kernel"])
        q[f"{mod}/{name}"] = {
            "w8": w8, "scale": ws,
            "bias": jnp.asarray(blk[mod][name]["bias"], jnp.float32),
        }
    q["ln_1"] = blk["ln_1"]
    q["ln_2"] = blk["ln_2"]
    if heads and n_groups:
        from ..ops.quant_matmul import regroup_attn_weights

        wg, sg, bg, og = regroup_attn_weights(
            q["attn/qkv"]["w8"], q["attn/qkv"]["scale"],
            q["attn/qkv"]["bias"], q["attn/out_proj"]["w8"],
            heads, n_groups)
        # (no n_groups entry: the dict crosses jit boundaries, where an
        # int leaf would become a traced array; consumers re-derive the
        # grouping from config and the leading axis carries it anyway)
        q["attn/qkv_g"] = {"w8_g": wg, "scale_g": sg, "bias_g": bg,
                           "out_g": og}
    return q


def quantize_siglip_params(params: Dict, config: SigLIPConfig) -> Dict:
    """Quantize the SigLIP vision tower's GEMM weights once."""
    from ..ops.quant import quantize_weight

    vp = params["visual"]
    p = config.patch_size

    conv_kernel = jnp.asarray(vp["conv1"]["kernel"], jnp.float32)
    k8, ks = quantize_weight(conv_kernel.reshape(p * p * 3,
                                                 config.vision_width))

    from .fast_siglip import siglip_attn_groups

    blocks = {}
    for i in range(config.vision_layers):
        blocks[f"resblocks_{i}"] = quantize_siglip_block(
            vp["transformer"][f"resblocks_{i}"], config.vision_heads,
            siglip_attn_groups(config))

    return {
        "conv1": {"w8": k8, "scale": ks,
                  "bias": jnp.asarray(vp["conv1"]["bias"], jnp.float32)},
        "positional_embedding": vp["positional_embedding"],
        "ln_post": vp["ln_post"],
        "attnpool": vp["attnpool"],
        "transformer": blocks,
    }


def apply_int8_siglip_blocks(qblocks: Dict, x: jax.Array,
                             config: SigLIPConfig, *, start: int, stop: int,
                             use_pallas: bool, use_split_attn: bool,
                             interpret: bool = False) -> jax.Array:
    """SigLIP transformer blocks [start, stop) through the measured int8
    recipe (split whole-block attention + chained int8 MLP when
    ``use_pallas``; unfused ``quant_dense`` math otherwise).  ``qblocks``
    is the quantized transformer dict ({resblocks_i:
    quantize_siglip_block(...)}); ``x`` is [B, S, W] tokens.  Forward-only
    — also the int8 frozen-prefix inside the PEFT train step
    (``fast_siglip.siglip_encode_hybrid``)."""
    from .fast_siglip import siglip_attn_groups

    width = config.vision_width
    heads = config.vision_heads
    b, s, _ = x.shape
    x2 = x.reshape(b * s, width)
    # 2 heads/program (odd head counts: 1 head/program) — shared with the
    # bf16 fast path; the grouping must divide heads exactly
    n_groups = siglip_attn_groups(config)
    for i in range(start, stop):
        blk = qblocks[f"resblocks_{i}"]
        qkv_q = blk["attn/qkv"]
        out_q = blk["attn/out_proj"]
        if use_split_attn:
            from ..ops.quant_matmul import (
                quant_attn_block_split,
                regroup_attn_weights,
            )

            if "attn/qkv_g" in blk:  # regrouped once at quantization time
                g = blk["attn/qkv_g"]
                wg, sg, bg, og = (g["w8_g"], g["scale_g"], g["bias_g"],
                                  g["out_g"])
                # the stored grouping wins: the hybrid prefix quantizes
                # with a more conservative hpg than encode (r5)
                n_groups = int(wg.shape[0])
            else:  # fallback: regroup in place (per call — avoid; pass
                # heads/n_groups to quantize_siglip_block instead)
                wg, sg, bg, og = regroup_attn_weights(
                    qkv_q["w8"], qkv_q["scale"], qkv_q["bias"], out_q["w8"],
                    heads, n_groups)
            x3 = quant_attn_block_split(
                x2.reshape(b, s, width), wg, sg, bg, og, out_q["scale"],
                out_q["bias"], blk["ln_1"]["scale"], blk["ln_1"]["bias"],
                heads, n_groups, ln_eps=LN_EPS, interpret=interpret)
            x2 = x3.reshape(b * s, width)
        elif use_pallas:
            qkv = quant_matmul_fused(
                x2, qkv_q["w8"], qkv_q["scale"], qkv_q["bias"],
                ln_scale=blk["ln_1"]["scale"], ln_bias=blk["ln_1"]["bias"],
                ln_eps=LN_EPS, interpret=interpret)
            q, k, v = jnp.split(qkv.reshape(b, s, 3 * width), 3, axis=-1)
            attn = attention(q, k, v, heads).reshape(b * s, width)
            x2 = quant_matmul_fused(attn, out_q["w8"], out_q["scale"],
                                    out_q["bias"], residual=x2,
                                    interpret=interpret)
        else:
            ln1 = _ln(x2, blk["ln_1"]["scale"], blk["ln_1"]["bias"],
                      eps=LN_EPS)
            qkv = quant_dense(ln1, qkv_q["w8"], qkv_q["scale"],
                              qkv_q["bias"])
            q, k, v = jnp.split(qkv.reshape(b, s, 3 * width), 3, axis=-1)
            attn = attention(q, k, v, heads).reshape(b * s, width)
            x2 = x2 + quant_dense(attn, out_q["w8"], out_q["scale"],
                                  out_q["bias"])
        fc, pr = blk["mlp/c_fc"], blk["mlp/c_proj"]
        if use_pallas:
            # chained int8 MLP: measured FASTER in-tower than the
            # whole-block kernel (283 vs 294 ms e2e) even though the
            # whole-block kernel wins in isolation — see PERF_NOTES.md
            hdn8, hsc = quant_matmul_fused_qout(
                x2, fc["w8"], fc["scale"], fc["bias"],
                blk["ln_2"]["scale"], blk["ln_2"]["bias"],
                act="gelu_tanh", ln_eps=LN_EPS, interpret=interpret)
            x2 = quant_matmul_q8in(hdn8, hsc, pr["w8"], pr["scale"],
                                   pr["bias"], residual=x2,
                                   interpret=interpret)
        else:
            ln2 = _ln(x2, blk["ln_2"]["scale"], blk["ln_2"]["bias"],
                      eps=LN_EPS)
            hdn = quant_dense(ln2, fc["w8"], fc["scale"], fc["bias"],
                              act="gelu_tanh")
            x2 = x2 + quant_dense(hdn, pr["w8"], pr["scale"], pr["bias"])
    return x2.reshape(b, s, width)


def siglip_encode_int8(qparams: Dict, params: Dict, images: jax.Array,
                       config: SigLIPConfig, *, project: bool = False,
                       dtype=jnp.bfloat16, impl: str = "auto",
                       attn_impl: str = "auto", interpret: bool = False):
    """images: [B, H, W, 3] normalized NHWC -> pooled SigLIP embedding.

    ``params`` is the ORIGINAL tree (the high-precision MAP head runs
    through the canonical Flax module); ``qparams`` from
    ``quantize_siglip_params``.  ``attn_impl``: 'split' runs the
    head-group-split whole-block int8 attention kernel (LN + int8 QKV +
    MHA + int8 out-proj per image, 2 heads per program — the unsplit
    whole-block kernel exceeds VMEM at SO400M shapes); 'chained' keeps
    the per-GEMM kernels + the head-batched fused attention core; 'auto'
    picks the measured-faster split path on TPU."""
    if impl == "auto":
        impl = "pallas" if dispatch_backend() == "tpu" else "xla"
    use_pallas = impl == "pallas"
    if attn_impl == "auto":
        attn_impl = "split" if use_pallas else "chained"
    use_split_attn = use_pallas and attn_impl == "split"

    p = config.patch_size
    width = config.vision_width
    heads = config.vision_heads

    x = images.astype(dtype)
    b, h, w, c = x.shape
    gh, gw = h // p, w // p

    patches = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b * gh * gw, p * p * c)
    cq = qparams["conv1"]
    if use_pallas:
        x = quant_matmul_fused(patches, cq["w8"], cq["scale"], cq["bias"],
                               interpret=interpret)
    else:
        x = quant_dense(patches, cq["w8"], cq["scale"], cq["bias"])
    x = x.reshape(b, gh * gw, width)
    x = x + jnp.asarray(qparams["positional_embedding"], x.dtype)

    x = apply_int8_siglip_blocks(
        qparams["transformer"], x, config, start=0,
        stop=config.vision_layers, use_pallas=use_pallas,
        use_split_attn=use_split_attn, interpret=interpret)

    tokens = x
    tokens = _ln(tokens, qparams["ln_post"]["scale"],
                 qparams["ln_post"]["bias"], eps=LN_EPS)
    pooled = MAPHead(heads, config.vision_mlp_dim, dtype=dtype,
                     param_dtype=jnp.float32, name=None).apply(
        {"params": params["visual"]["attnpool"]}, tokens)
    if project:
        return pooled, pooled
    return pooled
