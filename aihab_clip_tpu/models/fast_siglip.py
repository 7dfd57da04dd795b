"""Fast SigLIP encode path: the SigLIP vision tower over fused kernels.

A pure function over the canonical ``SigLIPModel`` param tree (same
checkpoints, same numerics contract as `models/siglip.py`, which covers
the reference's default backbone — `/root/reference/configs/base.yaml:33`)
that restructures the per-op XLA graph the way ``fast_vit`` does for the
CLIP towers:

  * patchify as an explicit reshape + matmul (+ conv bias);
  * q/k/v PACKED into one [W, 3W] GEMM fused with the ln_1 prologue
    (``pack_siglip_fast_params`` concatenates the kernels once at load
    time) — one VMEM pass over the tokens instead of three separate
    projections;
  * self-attention through the measured dispatcher (the head-batched
    fused Pallas kernel wins at SigLIP's S=729 — PERF_NOTES.md);
  * out-proj + residual, LN2 + c_fc + tanh-GELU, and c_proj + residual
    as fused kernels (SO400M's 19.8 MB bf16 MLP weight pair exceeds the
    one-kernel VMEM budget, so the MLP uses the split LN+GEMM /
    GEMM+residual kernels like ViT-L);
  * ln_post + MAP pooling head stay on the canonical Flax module (one
    probe token — negligible).

Forward-only (encode/serving); training keeps the Flax module.
Equivalence is tested against ``SigLIPModel.encode_image``.

MEASURED VERDICT (v5e, SO400M-384, batch 64, eval preprocessing
included): 344.5 ms vs 330.8 ms canonical — the per-op fused path LOSES
at bf16, consistent with the ViT-B per-op experiments (PERF_NOTES.md):
XLA's cross-op fusions beat per-op prologue/epilogue kernels when the
weights are too large to keep a whole block's pair VMEM-resident.  Kept
(tested) for the record and for shapes where the balance differs; NOT
dispatched by ``fast_vit.encode_image_fastest``.  SigLIP's fast serving
path is int8 (``models/quant_siglip.py``, whole-block int8 MLP).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import attention
from ..ops.fused_linear import ln_matmul, matmul_residual
from .siglip import MAPHead, SigLIPConfig

LN_EPS = 1e-6


def _ln(x, scale, bias, eps=LN_EPS):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def pack_siglip_fast_params(params: Dict, config: SigLIPConfig,
                            dtype=jnp.bfloat16) -> Dict:
    """One-time packing of the separate q/k/v projections into a single
    [W, 3W] kernel (+ [3W] bias) per block, cast to the compute dtype.
    Done at load time so the packing never re-runs inside the jitted
    encode."""
    vp = params["visual"]
    packed = {}
    for i in range(config.vision_layers):
        blk = vp["transformer"][f"resblocks_{i}"]
        w = jnp.concatenate(
            [jnp.asarray(blk["attn"][n]["kernel"], dtype)
             for n in ("q_proj", "k_proj", "v_proj")], axis=1)
        b = jnp.concatenate(
            [jnp.asarray(blk["attn"][n]["bias"], jnp.float32)
             for n in ("q_proj", "k_proj", "v_proj")])
        packed[f"resblocks_{i}"] = {"w_qkv": w, "b_qkv": b}
    return packed


def siglip_encode_fast(params: Dict, images: jax.Array,
                       config: SigLIPConfig, *, project: bool = False,
                       dtype=jnp.bfloat16,
                       packed: Optional[Dict] = None):
    """images: [B, H, W, 3] normalized NHWC -> pooled SigLIP embedding
    (or (pooled, pooled) with project=True; SigLIP has no separate
    vision projection)."""
    vp = params["visual"]
    p = config.patch_size
    width = config.vision_width
    heads = config.vision_heads
    if packed is None:
        packed = pack_siglip_fast_params(params, config, dtype)

    x = images.astype(dtype)
    b, h, w, c = x.shape
    gh, gw = h // p, w // p
    patches = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, gh * gw, p * p * c)
    kernel2d = jnp.asarray(vp["conv1"]["kernel"], dtype).reshape(
        p * p * c, width)
    x = patches @ kernel2d + jnp.asarray(vp["conv1"]["bias"], dtype)
    x = x + jnp.asarray(vp["positional_embedding"], dtype)

    s = gh * gw
    x2 = x.reshape(b * s, width)
    for i in range(config.vision_layers):
        blk = vp["transformer"][f"resblocks_{i}"]
        pk = packed[f"resblocks_{i}"]
        qkv = ln_matmul(x2, blk["ln_1"]["scale"], blk["ln_1"]["bias"],
                        pk["w_qkv"], pk["b_qkv"], None, LN_EPS)
        q, k, v = jnp.split(qkv.reshape(b, s, 3 * width), 3, axis=-1)
        attn = attention(q, k, v, heads).reshape(b * s, width)
        x2 = matmul_residual(
            attn, jnp.asarray(blk["attn"]["out_proj"]["kernel"], dtype),
            blk["attn"]["out_proj"]["bias"], x2)
        hdn = ln_matmul(
            x2, blk["ln_2"]["scale"], blk["ln_2"]["bias"],
            jnp.asarray(blk["mlp"]["c_fc"]["kernel"], dtype),
            blk["mlp"]["c_fc"]["bias"], "gelu_tanh", LN_EPS)
        x2 = matmul_residual(
            hdn, jnp.asarray(blk["mlp"]["c_proj"]["kernel"], dtype),
            blk["mlp"]["c_proj"]["bias"], x2)

    tokens = x2.reshape(b, s, width)
    tokens = _ln(tokens, vp["ln_post"]["scale"], vp["ln_post"]["bias"])
    pooled = MAPHead(heads, config.vision_mlp_dim, dtype=dtype,
                     param_dtype=jnp.float32, name=None).apply(
        {"params": vp["attnpool"]}, tokens)
    if project:
        return pooled, pooled
    return pooled
