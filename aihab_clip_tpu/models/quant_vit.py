"""int8 (W8A8 dynamic) ViT encode path for serving.

A pure function over a pre-quantized version of the canonical
``CLIPModel`` param tree.  Quantization policy is MEASURED, not uniform
(v5e, batch 256, PERF_NOTES.md):

  * patchify, QKV in_proj, attn out_proj — int8 W8A8 via the fused
    Pallas kernel (``ops/quant_matmul.py``): ~1.5x over the bf16 GEMM at
    their K<=768 shapes;
  * the MLP as a chained pair: LN2 + c_fc + GELU requantizes its output
    (the widest activation moves at 1 byte/elem) and c_proj consumes the
    int8 directly (no quantize pass);
  * LayerNorms fp32, attention bf16 XLA (optimal at these sequence
    lengths), final ln_post/projection high-precision.

``impl='xla'`` (any backend, used by the CPU tests) runs the same math
through unfused ``quant_dense``; ``impl='auto'`` picks the Pallas kernel
on TPU.  Same structural pattern as ``fast_vit.vit_encode_fast``
(reference tower semantics: `/root/reference/clip/model.py:199-235`);
accuracy is validated against the bf16 tower by cosine similarity and
top-1 agreement tests.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..backend import dispatch_backend

from ..ops.attention import _xla_attention
from ..ops.quant import quant_dense, quantize_weight
from .clip import CLIPConfig


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def quantize_vit_block(blk: Dict) -> Dict:
    """Quantize one canonical ViT transformer block's GEMM weights
    (jnp ops — usable at load time OR inside a jitted program, e.g. the
    PEFT frozen-prefix quantization which runs once per epoch scan)."""
    q = {}
    for name in (("attn", "in_proj"), ("attn", "out_proj"),
                 ("mlp", "c_fc"), ("mlp", "c_proj")):
        w8, ws = quantize_weight(blk[name[0]][name[1]]["kernel"])
        q[f"{name[0]}/{name[1]}"] = {
            "w8": w8, "scale": ws,
            "bias": jnp.asarray(blk[name[0]][name[1]]["bias"],
                                jnp.float32),
        }
    q["ln_1"] = blk["ln_1"]
    q["ln_2"] = blk["ln_2"]
    return q


def quantize_vit_params(params: Dict, config: CLIPConfig) -> Dict:
    """Quantize the ViT tower's GEMM weights once (host/load time).

    Returns a new tree holding int8 kernels + fp32 scales for the hot
    GEMMs and passthrough references for everything else."""
    vp = params["visual"]
    p = config.vision_patch_size
    width = config.vision_width

    kernel = jnp.asarray(vp["conv1"]["kernel"], jnp.float32)  # HWIO
    k8, ks = quantize_weight(kernel.reshape(p * p * 3, width))

    blocks = {}
    for i in range(config.vision_layers):
        blocks[f"resblocks_{i}"] = quantize_vit_block(
            vp["transformer"][f"resblocks_{i}"])

    return {
        "conv1": {"w8": k8, "scale": ks},
        "class_embedding": vp["class_embedding"],
        "positional_embedding": vp["positional_embedding"],
        "ln_pre": vp["ln_pre"],
        "ln_post": vp["ln_post"],
        "proj": vp["proj"],
        "transformer": blocks,
    }



def _kernel_act(config) -> str:
    """Kernel-side activation for this tower: exact 'gelu' maps to the
    in-kernel fast approximation (Mosaic has no erf lowering;
    `ops/block_kernel.gelu_fast_f32` — default sig form, ~3.4e-6 error,
    `AIHAB_ERF_IMPL` selects the erf variants); AIHAB_NO_GELU_POLY=1
    restores the XLA fallback."""
    import os

    act = getattr(config, "act", "quick_gelu")
    if act == "gelu" and not os.environ.get("AIHAB_NO_GELU_POLY"):
        return "gelu_poly"
    return act


def _chained_int8_mlp(x2, fc, pr, ln_scale, ln_bias, *, act: str,
                      n_ch: int, interpret: bool = False):
    """Chained qout->q8in int8 MLP with optional hidden-dim chunking:
    n_ch > 1 slices c_fc's columns / c_proj's rows so only one
    <= ~8 MB weight slice is resident per kernel (ViT-bigG's 13 MB c_fc
    exceeds the one-matrix budget at any row tile).  Partial c_proj
    outputs accumulate through the q8in residual chain; the c_proj bias
    is applied exactly once.  Bit-identical to n_ch=1 up to f32
    accumulation order (tested)."""
    from ..ops.quant_matmul import quant_matmul_fused_qout, quant_matmul_q8in

    hidden = fc["w8"].shape[1]
    if n_ch <= 1:
        hdn8, hsc = quant_matmul_fused_qout(
            x2, fc["w8"], fc["scale"], fc["bias"], ln_scale, ln_bias,
            act=act, interpret=interpret)
        return quant_matmul_q8in(hdn8, hsc, pr["w8"], pr["scale"],
                                 pr["bias"], residual=x2,
                                 interpret=interpret)
    ch = hidden // n_ch
    acc = x2
    zero_b = jnp.zeros_like(pr["bias"])
    for c in range(n_ch):
        sl = slice(c * ch, (c + 1) * ch)
        hdn8, hsc = quant_matmul_fused_qout(
            x2, fc["w8"][:, sl], fc["scale"][sl], fc["bias"][sl],
            ln_scale, ln_bias, act=act, interpret=interpret)
        acc = quant_matmul_q8in(
            hdn8, hsc, pr["w8"][sl, :], pr["scale"],
            pr["bias"] if c == 0 else zero_b, residual=acc,
            interpret=interpret)
    return acc


def apply_int8_vit_blocks(qblocks: Dict, x: jax.Array, config: CLIPConfig,
                          *, start: int, stop: int,
                          interpret: bool = False) -> jax.Array:
    """Transformer blocks [start, stop) over the WHOLE-BLOCK int8 Pallas
    path (measured fastest at ViT shapes, v5e b256: 53.9 ms vs 56.8
    bf16-attn hybrid vs 61.6 bf16 whole-block vs 94.6 chained int8 —
    PERF_NOTES.md): one program per image for LN1 + int8 QKV + MHA +
    int8 out-proj + residual, one row-tiled kernel for LN2 + int8 MLP +
    residual (or ONE merged program for both halves where the full int8
    weight set fits VMEM).  ``qblocks`` is the quantized transformer dict
    ({resblocks_i: quantize_vit_block(...)}); ``x`` is [B, S, W] tokens
    (post ln_pre).  Forward-only — also serves as the int8 frozen-prefix
    inside the PEFT train step (``fast_vit.vit_encode_hybrid``)."""
    width = config.vision_width
    heads = config.vision_heads
    b, s, _ = x.shape
    act = _kernel_act(config)

    from ..models.fast_vit import (
        ATTN_WHOLE_KERNEL_MAX_BYTES,
        _attn_whole_vmem_bytes,
    )
    from ..ops.quant_matmul import (
        quant_attn_block_fused,
        quant_attn_block_split,
        quant_full_block_fused,
        quant_mlp_block_fused,
        regroup_attn_weights,
    )

    # long-sequence towers (ViT-L@336: S=577) exceed the unsplit
    # kernel's VMEM — use the head-group-split variant (int8 weights
    # are half the bf16 estimate, hence itemsize=1; 2 heads/group
    # when heads is even, else 1/group — must divide heads exactly)
    attn_split = (_attn_whole_vmem_bytes(s, width, 1)
                  > ATTN_WHOLE_KERNEL_MAX_BYTES)

    # merged attn+MLP single-program block (int8 weight set is half
    # the bf16 one): 4.20 vs 4.59 ms/block at ViT-B b256 same-session
    # (PERF_NOTES.md).  Gate on estimated per-program VMEM: resident
    # int8 weights + the f32 working set at this sequence length.
    # chunks=1 (whole hidden) measured identical to chunks=2 at ViT-B
    # and is bit-identical math to the two-kernel pair — prefer it
    hidden = qblocks[f"resblocks_{start}"]["mlp/c_fc"]["w8"].shape[1]
    s_pad16 = ((s + 15) // 16) * 16
    # short-sequence towers (ViT-B/32: S_pad=64) run G images per merged
    # program so the int8 GEMMs fill the M tile.  r5 ladder
    # (tools_dev/ab_vitb32.py --int8, b256 e2e): G=1/2/4/8/16 ->
    # 10,279/11,499/12,664/10,397/9,927 img/s — G=4 is the knee (the
    # int8 path's per-row quantize VPU passes scale with G*S rows and
    # overtake the M-fill win past 4; bf16's knee is 8).  Still loses to
    # bf16 G=8 (14,160) — int8 B/32 remains the density option only.
    # AIHAB_INT8_FULL_BLOCK_G overrides for A/B.
    import os

    full_g = 4 if s_pad16 <= 64 else 1
    if os.environ.get("AIHAB_INT8_FULL_BLOCK_G"):
        full_g = int(os.environ["AIHAB_INT8_FULL_BLOCK_G"])
    est = ((4 * width * width + 2 * width * hidden)      # int8 weights
           + full_g * (s_pad16 * 3 * width * 4           # qkv f32
                       + 3 * s_pad16 * width * 4         # x/y1/out f32
                       + s_pad16 * hidden * 4)           # hidden f32
           + s_pad16 * s_pad16 * 4)                      # score matrix
    merge = not attn_split and est <= 15 * 2 ** 20
    if not merge and full_g > 1:
        # re-gate at G=1 before giving up on the merge entirely
        est1 = ((4 * width * width + 2 * width * hidden)
                + s_pad16 * 3 * width * 4
                + 3 * s_pad16 * width * 4
                + s_pad16 * hidden * 4
                + s_pad16 * s_pad16 * 4)
        if not attn_split and est1 <= 15 * 2 ** 20:
            merge, full_g = True, 1

    # two-kernel towers keep the sequence padded across every kernel
    # boundary (pad once / slice once) — see fast_vit._apply_fused_blocks
    seq_len = s
    s_pad = ((s + 15) // 16) * 16
    if not merge and s_pad != seq_len:
        x = jnp.pad(x, ((0, 0), (0, s_pad - seq_len), (0, 0)))
        s = s_pad

    for i in range(start, stop):
        blk = qblocks[f"resblocks_{i}"]
        ip, op = blk["attn/in_proj"], blk["attn/out_proj"]
        fc, pr = blk["mlp/c_fc"], blk["mlp/c_proj"]
        if merge:
            x = quant_full_block_fused(
                x, ip["w8"], ip["scale"], ip["bias"],
                op["w8"], op["scale"], op["bias"],
                blk["ln_1"]["scale"], blk["ln_1"]["bias"],
                fc["w8"], fc["scale"], fc["bias"],
                pr["w8"], pr["scale"], pr["bias"],
                blk["ln_2"]["scale"], blk["ln_2"]["bias"],
                heads, mlp_chunks=1, act=act, interpret=interpret,
                images_per_program=full_g)
            continue
        if attn_split:
            n_groups = (heads // 2 if heads % 2 == 0 and heads >= 2
                        else heads)
            wg, sg, bg, og = regroup_attn_weights(
                ip["w8"], ip["scale"], ip["bias"], op["w8"],
                heads, n_groups)
            x = quant_attn_block_split(
                x, wg, sg, bg, og, op["scale"], op["bias"],
                blk["ln_1"]["scale"], blk["ln_1"]["bias"], heads,
                n_groups, interpret=interpret,
                padded_io=True, seq_len=seq_len)
        else:
            x = quant_attn_block_fused(
                x, ip["w8"], ip["scale"], ip["bias"],
                op["w8"], op["scale"], op["bias"],
                blk["ln_1"]["scale"], blk["ln_1"]["bias"], heads,
                interpret=interpret,
                padded_io=True, seq_len=seq_len)
        hidden = fc["w8"].shape[1]
        if width * hidden * 2 <= 12 * 2 ** 20:
            x2 = quant_mlp_block_fused(
                x.reshape(b * s, width), fc["w8"], fc["scale"], fc["bias"],
                pr["w8"], pr["scale"], pr["bias"],
                blk["ln_2"]["scale"], blk["ln_2"]["bias"],
                act=act, interpret=interpret)
        else:
            # towers whose int8 MLP pair alone approaches physical VMEM
            # (ViT-g: 17.3 MB — measured scoped-vmem OOM at any row
            # tile, r3) take the chained qout->q8in pair: only ONE
            # weight matrix resident per kernel, the int8 hidden crosses
            # HBM at 1 byte/elem.  ViT-bigG's single c_fc (13 MB int8)
            # exceeds even the one-matrix budget — split the hidden dim
            # into the fewest chunks whose c_fc slice fits (r4; the bf16
            # chunk-ladder recipe), accumulating partial c_proj outputs
            # through the q8in residual chain (bias applied once)
            from ..ops.quant_matmul import (
                quant_matmul_fused_qout,
                quant_matmul_q8in,
            )

            x2 = x.reshape(b * s, width)
            n_ch = 1
            while (width * hidden // n_ch > 8 * 2 ** 20
                   and hidden % (n_ch * 2) == 0):
                n_ch *= 2
            x2 = _chained_int8_mlp(x2, fc, pr, blk["ln_2"]["scale"],
                                   blk["ln_2"]["bias"], act=act,
                                   n_ch=n_ch, interpret=interpret)
        x = x2.reshape(b, s, width)
    if not merge and s_pad != seq_len:
        x = x[:, :seq_len, :]
    return x


def vit_encode_int8(qparams: Dict, images: jax.Array, config: CLIPConfig,
                    *, project: bool = False, dtype=jnp.bfloat16,
                    impl: str = "auto", interpret: bool = False):
    """images: [B, H, W, 3] normalized NHWC -> pre-projection CLS features
    (or (pre, projected)).  ``qparams`` from ``quantize_vit_params``.
    ``impl``: 'auto' (whole-block Pallas kernels on TPU), 'pallas'
    (whole-block), 'chained' (per-GEMM fused kernels), or 'xla'."""
    if impl == "auto":
        impl = "pallas" if dispatch_backend() == "tpu" else "xla"
    # exact-erf gelu towers ride the kernels via the in-kernel rational
    # erf since r3 (see _kernel_act); AIHAB_NO_GELU_POLY=1 restores the
    # pre-r3 XLA fallback for them
    if (_kernel_act(config) == "gelu" and impl != "xla"):
        impl = "xla"
    if impl in ("pallas", "chained"):
        from ..ops.quant_matmul import quant_matmul_fused

        def qmm(x, q, act=None, residual=None, ln=None):
            return quant_matmul_fused(x, q["w8"], q["scale"],
                                      q.get("bias", jnp.zeros(
                                          q["w8"].shape[1], jnp.float32)),
                                      act=act or "none", residual=residual,
                                      ln_scale=None if ln is None else ln[0],
                                      ln_bias=None if ln is None else ln[1],
                                      interpret=interpret)
    else:
        def qmm(x, q, act=None, residual=None, ln=None):
            if ln is not None:
                x = _ln(x, ln[0], ln[1])
            out = quant_dense(x, q["w8"], q["scale"], q.get("bias"),
                              act=act)
            return out if residual is None else out + residual

    p = config.vision_patch_size
    width = config.vision_width
    heads = config.vision_heads

    x = images.astype(dtype)
    b, h, w, c = x.shape
    gh, gw = h // p, w // p

    patches = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b * gh * gw, p * p * c)
    x = qmm(patches, qparams["conv1"]).reshape(b, gh * gw, width)

    cls = jnp.broadcast_to(
        jnp.asarray(qparams["class_embedding"], dtype)[None, None, :],
        (b, 1, width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + jnp.asarray(qparams["positional_embedding"], dtype)
    x = _ln(x, qparams["ln_pre"]["scale"], qparams["ln_pre"]["bias"])

    s = x.shape[1]
    if impl == "pallas":
        x = apply_int8_vit_blocks(qparams["transformer"], x, config,
                                  start=0, stop=config.vision_layers,
                                  interpret=interpret)
        x2 = x.reshape(b * s, width)
    else:
        x2 = x.reshape(b * s, width)
        for i in range(config.vision_layers):
            blk = qparams["transformer"][f"resblocks_{i}"]
            if impl == "chained":
                # LN prologues fused into the quant kernels: the
                # normalized activations never round-trip through HBM
                qkv = qmm(x2, blk["attn/in_proj"],
                          ln=(blk["ln_1"]["scale"], blk["ln_1"]["bias"]))
            else:
                ln1 = _ln(x2, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
                qkv = qmm(ln1, blk["attn/in_proj"])
            q, k, v = jnp.split(qkv.reshape(b, s, 3 * width), 3, axis=-1)
            attn = _xla_attention(q, k, v, heads).reshape(b * s, width)
            x2 = qmm(attn, blk["attn/out_proj"], residual=x2)
            fc, pr = blk["mlp/c_fc"], blk["mlp/c_proj"]
            if impl == "chained":
                # fully-int8 MLP chain: LN+c_fc+GELU emits
                # already-quantized int8 (+ row scales) and c_proj
                # consumes it with no quantize pass
                from ..ops.quant_matmul import (
                    quant_matmul_fused_qout,
                    quant_matmul_q8in,
                )

                hdn8, hsc = quant_matmul_fused_qout(
                    x2, fc["w8"], fc["scale"], fc["bias"],
                    blk["ln_2"]["scale"], blk["ln_2"]["bias"],
                    act=_kernel_act(config), interpret=interpret)
                x2 = quant_matmul_q8in(hdn8, hsc, pr["w8"], pr["scale"],
                                       pr["bias"], residual=x2,
                                       interpret=interpret)
            else:
                ln2 = _ln(x2, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
                hdn = qmm(ln2, fc, act=_kernel_act(config))
                x2 = qmm(hdn, pr, residual=x2)

    cls_tok = x2.reshape(b, s, width)[:, 0, :]
    pre = _ln(cls_tok, qparams["ln_post"]["scale"], qparams["ln_post"]["bias"])
    if not project:
        return pre
    projected = pre @ jnp.asarray(qparams["proj"], pre.dtype)
    return pre, projected
