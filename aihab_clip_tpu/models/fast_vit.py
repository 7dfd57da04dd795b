"""Fast ViT encode path: the CLIP vision tower over fused Pallas kernels.

A pure function over the canonical ``CLIPModel`` param tree (same
checkpoints, same numerics contract) that replaces the per-op XLA graph
with the fused linear kernels from ``ops/fused_linear.py``:

  * patchify as an explicit reshape+matmul (a stride=kernel conv IS a
    patch matmul — feeds the MXU directly, no conv layout overhead);
  * per block: LN1+QKV in one kernel, XLA attention (measured optimal at
    these sequence lengths), out-proj+residual in one kernel, LN2+c_fc+
    QuickGELU in one kernel, c_proj+residual in one kernel — normalized /
    activated activations never round-trip through HBM;
  * ln_post + projection on the CLS row only.

This is the inference/encode fast path (bench + evaluation); training and
parity baselines use the canonical Flax module.  Equivalence is tested
against ``CLIPModel.encode_image`` (CPU interpret mode exact to fp32
tolerance; on-device to bf16 tolerance).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..backend import dispatch_backend

from ..ops.attention import _xla_attention
from ..ops.fused_linear import ln_matmul, matmul_residual
from .clip import CLIPConfig
from .layers import quick_gelu, resolve_act

# combined c_fc+c_proj VMEM budget for the one-kernel MLP path
MLP_WHOLE_KERNEL_MAX_BYTES = 11 * 2 ** 20

# per-program VMEM budget for the UNSPLIT whole-block attention kernel;
# above this the head-group-split kernel dispatches instead (ViT-L@336's
# S=577 towers fail to compile unsplit — measured)
ATTN_WHOLE_KERNEL_MAX_BYTES = 15 * 2 ** 20

# merged attn+MLP single-program kernel: the block's FULL weight set
# (QKV + out-proj + both MLP matrices) must stay VMEM-resident.  ViT-B's
# 14.1 MB bf16 set compiles and measures 4.82 vs 5.12 ms/block against
# the two-kernel dispatch (v5e b256, same-session A/B — PERF_NOTES.md);
# ViT-L's 25.2 MB does not fit and keeps the two-kernel path.
FULL_BLOCK_KERNEL_MAX_BYTES = 15 * 2 ** 20


def _attn_whole_vmem_bytes(seq: int, width: int, itemsize: int = 2) -> int:
    """Rough per-program liveness of ``attn_block_fused``: resident
    QKV/out weights + f32 qkv + f32 x/out copies + one score matrix +
    the bf16 in/out tiles."""
    s_pad = ((seq + 15) // 16) * 16
    return (4 * width * width * itemsize      # w_qkv [W,3W] + w_out [W,W]
            + s_pad * 3 * width * 4           # qkv f32
            + 2 * s_pad * width * 4           # x f32 + out f32
            + s_pad * s_pad * 4               # scores (reused per head)
            + 2 * s_pad * width * itemsize)   # in/out tiles


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _vit_embed(vp, images: jax.Array, config: CLIPConfig, dtype):
    """Shared ViT preamble: patchify-as-matmul (a stride=kernel conv IS a
    patch matmul), prepend class token, add positional embedding, ln_pre.
    Returns [B, S, W] tokens."""
    p = config.vision_patch_size
    width = config.vision_width
    x = images.astype(dtype)
    b, h, w, c = x.shape
    gh, gw = h // p, w // p
    patches = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b, gh * gw, p * p * c)
    kernel = jnp.asarray(vp["conv1"]["kernel"], dtype)  # [p, p, c, W] HWIO
    x = patches @ kernel.reshape(p * p * c, width)
    cls = jnp.broadcast_to(
        jnp.asarray(vp["class_embedding"], dtype)[None, None, :],
        (b, 1, width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + jnp.asarray(vp["positional_embedding"], dtype)
    return _ln(x, vp["ln_pre"]["scale"], vp["ln_pre"]["bias"])


def vit_encode_fast(params, images: jax.Array, config: CLIPConfig,
                    *, project: bool = False, dtype=jnp.bfloat16):
    """images: [B, H, W, 3] normalized NHWC -> pre-projection CLS features
    (or (pre, projected))."""
    vp = params["visual"]
    width = config.vision_width
    heads = config.vision_heads

    x = _vit_embed(vp, images, config, dtype)
    b, s, _ = x.shape
    x2 = x.reshape(b * s, width)
    blocks = vp["transformer"]
    for i in range(config.vision_layers):
        blk = blocks[f"resblocks_{i}"]
        qkv = ln_matmul(
            x2,
            blk["ln_1"]["scale"], blk["ln_1"]["bias"],
            jnp.asarray(blk["attn"]["in_proj"]["kernel"], dtype),
            blk["attn"]["in_proj"]["bias"])
        q, k, v = jnp.split(qkv.reshape(b, s, 3 * width), 3, axis=-1)
        attn = _xla_attention(q, k, v, heads).reshape(b * s, width)
        x2 = matmul_residual(
            attn, jnp.asarray(blk["attn"]["out_proj"]["kernel"], dtype),
            blk["attn"]["out_proj"]["bias"], x2)
        hdn = ln_matmul(
            x2, blk["ln_2"]["scale"], blk["ln_2"]["bias"],
            jnp.asarray(blk["mlp"]["c_fc"]["kernel"], dtype),
            blk["mlp"]["c_fc"]["bias"], config.act)
        x2 = matmul_residual(
            hdn, jnp.asarray(blk["mlp"]["c_proj"]["kernel"], dtype),
            blk["mlp"]["c_proj"]["bias"], x2)

    cls_tok = x2.reshape(b, s, width)[:, 0, :]
    pre = _ln(cls_tok, vp["ln_post"]["scale"], vp["ln_post"]["bias"])
    if not project:
        return pre
    projected = pre @ jnp.asarray(vp["proj"], pre.dtype)
    return pre, projected


def _canonical_clip_block(x, blk, heads: int, dtype, act: str = "quick_gelu"):
    """One differentiable CLIP-ViT transformer block in plain jnp,
    numerically the Flax ``ResidualAttentionBlock`` (fp32 LN eps 1e-5,
    packed in_proj, QuickGELU in compute dtype, same attention
    dispatch)."""
    from ..ops.attention import attention

    def proj(t, pr):
        return (t @ jnp.asarray(pr["kernel"], dtype)
                + jnp.asarray(pr["bias"], dtype))

    ln1 = _ln(x, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
    qkv = proj(ln1, blk["attn"]["in_proj"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    x = x + proj(attention(q, k, v, heads), blk["attn"]["out_proj"])
    ln2 = _ln(x, blk["ln_2"]["scale"], blk["ln_2"]["bias"])
    h = resolve_act(act)(proj(ln2, blk["mlp"]["c_fc"]))
    return x + proj(h, blk["mlp"]["c_proj"])


def vit_encode_scan(params, images: jax.Array, config: CLIPConfig, *,
                    project: bool = False, dtype=jnp.bfloat16,
                    stacked=None, remat: bool = False):
    """Canonical CLIP-ViT encode with the block stack under ``lax.scan``
    (numerically the module tower; one block body in the compiled program
    instead of L — see ``fast_siglip.canonical_blocks_scan``).

    ``remat=True`` checkpoints the scanned body — grad-identical, and the
    workaround for the XLA:TPU grad-of-scan compiler crash at large
    [B, S, W] (bisected on the SigLIP tower at [16, 576, 1152];
    `tools_dev/repro_scan_crash.py`).  Train paths pass remat=True."""
    from .fast_siglip import stack_block_params

    vp = params["visual"]
    if stacked is None:
        stacked = stack_block_params(vp, 0, config.vision_layers)
    x = _vit_embed(vp, images, config, dtype)

    def body(h, bp):
        return _canonical_clip_block(h, bp, config.vision_heads, dtype), None

    x, _ = jax.lax.scan(jax.checkpoint(body) if remat else body, x, stacked)
    pre = _ln(x[:, 0, :], vp["ln_post"]["scale"], vp["ln_post"]["bias"])
    if not project:
        return pre
    return pre, pre @ jnp.asarray(vp["proj"], dtype)


def pack_fastest(model, params, config, dtype=jnp.bfloat16):
    """Build the per-family precomputed pack for ``encode_image_fastest``
    (run ONCE at load/setup time, outside jit; pass the result through a
    jit ARGUMENT — closing over it would embed multi-GB constants):

      * SigLIP: per-head-group q/k/v regrouping (`fast_siglip`)
      * ConvNeXt: banded depthwise matrices (`fast_convnext`, ~4x over
        XLA's depthwise lowering at stage-2 shapes, r4)
      * ModifiedResNet: the FrozenBN-folded conv tree (`fast_resnet`)
      * ViT: None (nothing to precompute)

    Returns None when there is nothing to pack or the backend is not
    TPU (the canonical paths need no pack)."""
    from .siglip import SigLIPConfig

    if dispatch_backend() != "tpu":
        return None
    if isinstance(config, SigLIPConfig):
        from .fast_siglip import pack_siglip_fast_params

        return pack_siglip_fast_params(params, config, dtype)
    if isinstance(config, CLIPConfig) \
            and getattr(config, "vision_tower", "") == "convnext":
        from .fast_convnext import build_dw_matrices

        dwmat = build_dw_matrices(params, config, dtype=dtype)
        return None if dwmat is None else {"dwmat": dwmat}
    if isinstance(config, CLIPConfig) and not config.is_vit:
        from .fast_resnet import fold_resnet_bn

        return {"folded_rn": fold_resnet_bn(params["visual"], dtype=dtype)}
    return None


def encode_image_fastest(model, params, x: jax.Array, config, *,
                         project: bool = False, mesh=None, packed=None):
    """Fastest parity-tested image encode for the current backend.

    TPU + CLIP-ViT towers take the whole-block fused Pallas path
    (forward-only; 1.55x end-to-end over the canonical XLA tower,
    PERF_NOTES.md).  Under a data-parallel mesh the same kernels run per
    shard via ``shard_map`` (GSPMD cannot partition a ``pallas_call``,
    but manual sharding composes fine — each device encodes its batch
    shard with replicated weights).  Everything else (CPU, RN,
    meshes with any non-'data' axis > 1 — TP/pipeline shard the weights —
    and training steps that need gradients) uses the canonical Flax
    module.  FSDP shards weights over the 'data' axis itself and is NOT
    detectable from the mesh shape: callers with data-axis-sharded
    weights must route around this function (``make_eval_step`` passes
    ``sharded_weights=True``).
    SigLIP towers take the split-whole-block-attention path
    (``models/fast_siglip.py``: +20% at SO400M-384; the quantized
    serving path is int8, ``models/quant_siglip.py``)."""
    from .siglip import SigLIPConfig

    on_tpu = dispatch_backend() == "tpu"
    if on_tpu and isinstance(config, CLIPConfig) and config.is_vit:
        if mesh is None:
            return vit_encode_block_fused(params, x, config, project=project,
                                          dtype=x.dtype)
        if (all(v == 1 for k, v in dict(mesh.shape).items()
                if k != "data")
                and x.shape[0] % dict(mesh.shape).get("data", 1) == 0):
            return vit_encode_block_fused_sharded(
                params, x, config, mesh, project=project, dtype=x.dtype)
    if (on_tpu and isinstance(config, CLIPConfig)
            and getattr(config, "vision_tower", "") == "convnext"):
        # ConvNeXt: stem/downsample convs stay canonical XLA; every
        # block's MLP half runs the fused VMEM-resident kernel and the
        # depthwise 7x7 takes the banded-matmul form when the caller
        # passes the precomputed matrices (`packed` from pack_fastest —
        # building them in-jit would cost the win back in HBM writes).
        # Pure-DP meshes run the same kernels per shard via shard_map
        # (a pallas_call is opaque to GSPMD), like the ViT/SigLIP paths.
        from .fast_convnext import convnext_encode_fused

        dwmat = packed.get("dwmat") if isinstance(packed, dict) else None
        if mesh is None:
            return convnext_encode_fused(params, x, config, project=project,
                                         dtype=x.dtype, dwmat=dwmat)
        if (all(v == 1 for k, v in dict(mesh.shape).items() if k != "data")
                and x.shape[0] % dict(mesh.shape).get("data", 1) == 0):
            def local_encode(w, xs):
                return convnext_encode_fused(w[0], xs, config,
                                             project=project,
                                             dtype=xs.dtype, dwmat=w[1])

            return encode_fn_sharded(local_encode, (params, dwmat), x, mesh,
                                     pair_output=project)
    if (on_tpu and isinstance(config, CLIPConfig) and not config.is_vit
            and getattr(config, "vision_tower", "") != "convnext"
            and isinstance(packed, dict) and "folded_rn" in packed):
        # ModifiedResNet with the FrozenBN-folded conv tree precomputed
        # (pack_fastest): exact fold of the frozen stats into conv
        # kernels+biases — removes the separate BN elementwise pass per
        # conv.  Without a pack the canonical module below applies.
        from .fast_resnet import resnet_encode_folded

        if mesh is None:
            return resnet_encode_folded(packed["folded_rn"], x, config,
                                        project=project, dtype=x.dtype)
        if (all(v == 1 for k, v in dict(mesh.shape).items() if k != "data")
                and x.shape[0] % dict(mesh.shape).get("data", 1) == 0):
            def local_encode(w, xs):
                return resnet_encode_folded(w, xs, config, project=project,
                                            dtype=xs.dtype)

            return encode_fn_sharded(local_encode, packed["folded_rn"], x,
                                     mesh, pair_output=project)
    if on_tpu and isinstance(config, SigLIPConfig):
        from .fast_siglip import siglip_encode_fast

        # pass `packed` (pack_siglip_fast_params at load time) through a
        # jit argument where possible — without it the q/k/v regrouping
        # re-runs per call (~0.3% of a SO400M encode)
        if mesh is None:
            return siglip_encode_fast(params, x, config, project=project,
                                      dtype=x.dtype, packed=packed)
        if (all(v == 1 for k, v in dict(mesh.shape).items()
                if k != "data")
                and x.shape[0] % dict(mesh.shape).get("data", 1) == 0):
            # `packed` rides inside the weights operand (closing over it
            # would embed the packed arrays as compile-time constants)
            return encode_fn_sharded(
                lambda w, xs: siglip_encode_fast(w[0], xs, config,
                                                 project=project,
                                                 dtype=xs.dtype,
                                                 packed=w[1]),
                (params, packed), x, mesh, pair_output=project)
    return model.apply({"params": params}, x,
                       method=type(model).encode_image, project=project)


def encode_fn_sharded(encode_fn, params, x: jax.Array, mesh, *,
                      pair_output: bool = False):
    """Run any pure encode fn under a data-parallel mesh via shard_map:
    each device encodes its batch shard with replicated params."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    out_specs = (P("data"), P("data")) if pair_output else P("data")
    fn = shard_map(encode_fn, mesh=mesh, in_specs=(P(), P("data")),
                   out_specs=out_specs, check_rep=False)
    return fn(params, x)


def vit_encode_block_fused_sharded(params, x: jax.Array, config, mesh, *,
                                   project: bool = False,
                                   dtype=jnp.bfloat16,
                                   interpret: bool = False):
    """Whole-block fused encode under a GSPMD mesh: ``shard_map`` over the
    ``data`` axis — each device runs the Pallas kernels on its batch
    shard with replicated params.  Requires replicated weights (no
    ``model``-axis sharding) and a batch divisible by the data axis."""

    def local_encode(p, xs):
        return vit_encode_block_fused(p, xs, config, project=project,
                                      dtype=dtype, interpret=interpret)

    return encode_fn_sharded(local_encode, params, x, mesh,
                             pair_output=project)


def vit_encode_train(params, images: jax.Array, config: CLIPConfig,
                     *, project: bool = False, dtype=jnp.bfloat16,
                     interpret: bool = False):
    """DIFFERENTIABLE fast encode for training steps (TPU, CLIP-ViT).

    The attention half stays the canonical XLA graph (its backward is
    XLA-generated); the MLP half — 2/3 of the block FLOPs — runs through
    ``ops/block_kernel.mlp_block_train``: a fused whole-block forward
    (emitting the c_fc pre-activation) and a fused backward for the dx
    chain, with weight grads as plain XLA GEMMs over the emitted
    tensors.  Gradients match the canonical formulation (tested to
    1e-4); numerics contract (fp32 LN, bf16 GEMMs w/ fp32 accum)
    preserved.  Only dispatched when the MLP weight pair fits the
    one-kernel VMEM budget (ViT-B class)."""
    from ..ops.attention import _xla_attention
    from ..ops.block_kernel import mlp_block_train

    vp = params["visual"]
    width = config.vision_width
    heads = config.vision_heads

    x = _vit_embed(vp, images, config, dtype)
    b, s, _ = x.shape
    for i in range(config.vision_layers):
        blk = vp["transformer"][f"resblocks_{i}"]
        # attention half: canonical XLA (differentiable as-is)
        ln1 = _ln(x, blk["ln_1"]["scale"], blk["ln_1"]["bias"])
        qkv = ln1 @ jnp.asarray(blk["attn"]["in_proj"]["kernel"], dtype)
        qkv = qkv + jnp.asarray(blk["attn"]["in_proj"]["bias"], dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = _xla_attention(q, k, v, heads)
        out = attn @ jnp.asarray(blk["attn"]["out_proj"]["kernel"], dtype)
        x = x + out + jnp.asarray(blk["attn"]["out_proj"]["bias"], dtype)
        # MLP half: fused fwd+bwd whole-block kernel
        x2 = mlp_block_train(
            x.reshape(b * s, width),
            blk["ln_2"]["scale"], blk["ln_2"]["bias"],
            jnp.asarray(blk["mlp"]["c_fc"]["kernel"], dtype),
            blk["mlp"]["c_fc"]["bias"],
            jnp.asarray(blk["mlp"]["c_proj"]["kernel"], dtype),
            blk["mlp"]["c_proj"]["bias"], interpret=interpret)
        x = x2.reshape(b, s, width)

    cls_tok = x[:, 0, :]
    pre = _ln(cls_tok, vp["ln_post"]["scale"], vp["ln_post"]["bias"])
    if not project:
        return pre
    projected = pre @ jnp.asarray(vp["proj"], pre.dtype)
    return pre, projected


def use_fused_train_encode(model, config, mesh=None,
                           dtype=jnp.bfloat16) -> bool:
    """Fused-training-tower dispatch gate: TPU, CLIP-ViT, no GSPMD mesh
    (Pallas does not partition), MLP weight pair within the one-kernel
    VMEM budget (in the actual compute dtype — an f32 tower doubles the
    pair bytes)."""
    if mesh is not None or dispatch_backend() != "tpu":
        return False
    if not (isinstance(config, CLIPConfig) and config.is_vit):
        return False
    hidden = config.vision_mlp_dim or 4 * config.vision_width
    pair_bytes = 2 * config.vision_width * hidden * jnp.dtype(dtype).itemsize
    return pair_bytes <= MLP_WHOLE_KERNEL_MAX_BYTES


def _fused_block_plan(config: CLIPConfig, dtype, merge_blocks: str = "auto"):
    """Static kernel-dispatch decisions for the fused block stack (shared
    by the full fused encode and the PEFT frozen-prefix hybrid)."""
    width = config.vision_width
    # one-kernel MLP only when BOTH weights fit VMEM next to the tiles
    # (ViT-B: 9.4 MB bf16 -> yes); otherwise split the hidden dim across
    # the fewest sequential whole-block kernels whose chunk pair fits
    # (ViT-L: 16.8 MB -> 2 chunks); per-op kernels only as a last resort
    hidden = config.vision_mlp_dim or 4 * width
    pair_bytes = 2 * (width * hidden * jnp.dtype(dtype).itemsize)
    # exact-erf 'gelu' (LAION towers) cannot lower inside Mosaic kernels
    # (no erf/erfc primitive — probed on hardware).  Since r3 the kernels
    # compute it as 'gelu_poly' (`block_kernel.gelu_fast_f32` — default
    # sigmoid-of-odd-poly since r4, ~3.4e-6 activation error, below bf16
    # resolution; AIHAB_ERF_IMPL restores the erf forms), so gelu towers
    # ride the full fused dispatch; AIHAB_NO_GELU_POLY=1 restores the
    # old XLA-MLP fallback (A/B + emergency opt-out).
    import os

    gelu_poly = (config.act == "gelu"
                 and not os.environ.get("AIHAB_NO_GELU_POLY"))
    kernel_act_ok = config.act in ("quick_gelu", "gelu_tanh") or gelu_poly
    mlp_whole = kernel_act_ok and pair_bytes <= MLP_WHOLE_KERNEL_MAX_BYTES
    mlp_chunks = 0
    if not mlp_whole and kernel_act_ok:
        # extend past 4 for the widest towers: ViT-bigG's 54.5 MB pair
        # needs 8 chunks (6.8 MB each); the per-op ln_matmul fallback
        # would try to hold the whole c_fc resident and crash Mosaic
        for n in (2, 3, 4, 6, 8):
            if hidden % n == 0 and pair_bytes // n <= MLP_WHOLE_KERNEL_MAX_BYTES:
                mlp_chunks = n
                break

    # long-sequence towers (ViT-L@336: S=577) exceed the unsplit
    # attention kernel's VMEM — dispatch the head-group-split variant
    # (2 heads/group when heads is even; 1 head/group otherwise — the
    # grouping must divide heads exactly)
    heads = config.vision_heads
    seq = (config.image_resolution // config.vision_patch_size) ** 2 + 1
    attn_split = (_attn_whole_vmem_bytes(seq, width,
                                         jnp.dtype(dtype).itemsize)
                  > ATTN_WHOLE_KERNEL_MAX_BYTES)

    # merged attn+MLP single-program block: a strict upgrade of the
    # {unsplit attention + whole-kernel MLP} regime — needs the full
    # per-block weight set resident in VMEM
    full_w_bytes = (4 * width * width + 2 * width * hidden) * jnp.dtype(
        dtype).itemsize
    merge = (merge_blocks != "off" and not attn_split and mlp_whole
             and kernel_act_ok
             and full_w_bytes <= FULL_BLOCK_KERNEL_MAX_BYTES)
    # hidden chunking bounds the f32 hidden tile's liveness (chunks=2
    # measured 57.8 vs 58.3 ms unchunked for the 12-block ViT-B tower)
    full_chunks = 2 if hidden % 2 == 0 else 1
    n_groups = heads // 2 if heads % 2 == 0 and heads >= 2 else heads
    # short-sequence towers under-fill the merged kernel's GEMM M tiles
    # (ViT-B/32: S_pad=64 -> every GEMM runs at M=64); batching G images
    # into one program fills them.  Measured at ViT-B/32 b256
    # (tools_dev/ab_vitb32.py, r4, A/B/A): G=8 18.1 ms vs G=1 20.0-20.3
    # (+12%, 57.4->64.6% MFU); G=2 18.6, G=4 18.3; G=16/32 crash the
    # Mosaic compiler, so 8 is the cap.  No change for S_pad >= 128
    # towers (ViT-B/16 runs M=208 rows already).  AIHAB_FULL_BLOCK_G
    # overrides for A/B.
    s_pad16 = ((seq + 15) // 16) * 16
    full_g = 8 if merge and s_pad16 <= 64 else 1
    if os.environ.get("AIHAB_FULL_BLOCK_G"):
        full_g = int(os.environ["AIHAB_FULL_BLOCK_G"])
    return dict(merge=merge, attn_split=attn_split, mlp_whole=mlp_whole,
                mlp_chunks=mlp_chunks, full_chunks=full_chunks,
                n_groups=n_groups, heads=heads, width=width, full_g=full_g,
                act="gelu_poly" if gelu_poly else config.act)


def _apply_fused_blocks(vp, x, config: CLIPConfig, dtype, *, start: int,
                        stop: int, plan=None, interpret: bool = False):
    """Run transformer blocks [start, stop) through the fused Pallas
    dispatch (forward-only).  Factored out so the PEFT frozen-prefix
    hybrid (`vit_encode_hybrid`) can fuse just the frozen bottom blocks."""
    from ..ops.block_kernel import (attn_block_fused, attn_block_split,
                                    full_block_fused, mlp_block_fused,
                                    mlp_block_split, regroup_attn_weights_f)

    if plan is None:
        plan = _fused_block_plan(config, dtype)
    merge = plan["merge"]
    attn_split = plan["attn_split"]
    mlp_whole = plan["mlp_whole"]
    mlp_chunks = plan["mlp_chunks"]
    full_chunks = plan["full_chunks"]
    heads = plan["heads"]
    width = plan["width"]
    b = x.shape[0]

    # two-kernel towers keep the sequence PADDED across every kernel
    # boundary: pad once here, slice once at the end.  Valid rows are
    # bit-identical (keys mask by seq_len; padded rows are row-local
    # garbage) and the per-boundary slice+re-pad copy pair disappears —
    # measured 0.50 ms/block of composition overhead at ViT-L b128
    # (PERF_NOTES "ViT-L attention core").  The merged path pads
    # internally as before.
    seq_len = x.shape[1]
    s_pad = ((seq_len + 15) // 16) * 16
    if not merge and s_pad != seq_len:
        x = jnp.pad(x, ((0, 0), (0, s_pad - seq_len), (0, 0)))

    for i in range(start, stop):
        blk = vp["transformer"][f"resblocks_{i}"]
        if merge:
            x = full_block_fused(
                x, blk["ln_1"]["scale"], blk["ln_1"]["bias"],
                jnp.asarray(blk["attn"]["in_proj"]["kernel"], dtype),
                blk["attn"]["in_proj"]["bias"],
                jnp.asarray(blk["attn"]["out_proj"]["kernel"], dtype),
                blk["attn"]["out_proj"]["bias"],
                blk["ln_2"]["scale"], blk["ln_2"]["bias"],
                jnp.asarray(blk["mlp"]["c_fc"]["kernel"], dtype),
                blk["mlp"]["c_fc"]["bias"],
                jnp.asarray(blk["mlp"]["c_proj"]["kernel"], dtype),
                blk["mlp"]["c_proj"]["bias"],
                heads, mlp_chunks=full_chunks, act=plan["act"],
                interpret=interpret,
                images_per_program=plan.get("full_g", 1))
            continue
        if attn_split:
            n_groups = plan["n_groups"]
            # per-call regroup costs ~0.1% of a ViT-L@336 encode (200 MB
            # of weight reshuffling vs a ~200 ms forward); not worth the
            # extra packed-params plumbing on this rare path
            wg, bg, og = regroup_attn_weights_f(
                jnp.asarray(blk["attn"]["in_proj"]["kernel"], dtype),
                blk["attn"]["in_proj"]["bias"],
                jnp.asarray(blk["attn"]["out_proj"]["kernel"], dtype),
                heads, n_groups)
            x = attn_block_split(
                x, wg, bg, og, blk["attn"]["out_proj"]["bias"],
                blk["ln_1"]["scale"], blk["ln_1"]["bias"],
                heads, n_groups, interpret=interpret,
                padded_io=True, seq_len=seq_len)
        else:
            x = attn_block_fused(
                x, blk["ln_1"]["scale"], blk["ln_1"]["bias"],
                jnp.asarray(blk["attn"]["in_proj"]["kernel"], dtype),
                blk["attn"]["in_proj"]["bias"],
                jnp.asarray(blk["attn"]["out_proj"]["kernel"], dtype),
                blk["attn"]["out_proj"]["bias"],
                heads, interpret=interpret,
                padded_io=True, seq_len=seq_len)
        s = x.shape[1]
        x2 = x.reshape(b * s, width)
        if mlp_whole:
            x2 = mlp_block_fused(
                x2, blk["ln_2"]["scale"], blk["ln_2"]["bias"],
                jnp.asarray(blk["mlp"]["c_fc"]["kernel"], dtype),
                blk["mlp"]["c_fc"]["bias"],
                jnp.asarray(blk["mlp"]["c_proj"]["kernel"], dtype),
                blk["mlp"]["c_proj"]["bias"], act=plan["act"],
                interpret=interpret)
        elif mlp_chunks:
            x2 = mlp_block_split(
                x2, blk["ln_2"]["scale"], blk["ln_2"]["bias"],
                jnp.asarray(blk["mlp"]["c_fc"]["kernel"], dtype),
                blk["mlp"]["c_fc"]["bias"],
                jnp.asarray(blk["mlp"]["c_proj"]["kernel"], dtype),
                blk["mlp"]["c_proj"]["bias"],
                n_chunks=mlp_chunks, act=plan["act"], interpret=interpret)
        else:
            hdn = ln_matmul(
                x2, blk["ln_2"]["scale"], blk["ln_2"]["bias"],
                jnp.asarray(blk["mlp"]["c_fc"]["kernel"], dtype),
                blk["mlp"]["c_fc"]["bias"], plan["act"])
            x2 = matmul_residual(
                hdn, jnp.asarray(blk["mlp"]["c_proj"]["kernel"], dtype),
                blk["mlp"]["c_proj"]["bias"], x2)
        x = x2.reshape(b, s, width)
    if not merge and s_pad != seq_len:
        x = x[:, :seq_len, :]
    return x


def vit_encode_block_fused(params, images: jax.Array, config: CLIPConfig,
                           *, project: bool = False, dtype=jnp.bfloat16,
                           merge_blocks: str = "auto",
                           interpret: bool = False):
    """Whole-block fused encode: the measured-fastest ViT forward on TPU.

    Per transformer block, either ONE merged Pallas program per image
    (LN1+QKV+attention+out-proj+residual+LN2+MLP+residual — the residual
    stream never touches HBM inside a block; dispatched when the block's
    full weight set fits VMEM, e.g. ViT-B: 4.82 vs 5.12 ms/block) or two
    Pallas calls (attention half with one program per image, MLP half
    row-tiled) — activations cross HBM once per half block instead of
    per op.  Measured 62.5 ms vs 107.4 ms for the 12 ViT-B/16 blocks at
    batch 256 before the merge (1.7x; PERF_NOTES.md).  Towers whose MLP
    weight pair exceeds the one-kernel VMEM budget (ViT-L: 16.8 MB) split
    the hidden dim across sequential whole-block kernels instead of
    falling back to per-op kernels — the [M, hidden] activation never
    crosses HBM (8.15 -> 6.96 ms/block at ViT-L shapes).  Forward-only
    (encode/serving); training uses the canonical Flax module or the
    frozen-prefix hybrid (`vit_encode_hybrid`).
    ``merge_blocks``: 'auto' (budget-gated) or 'off' (A/B control)."""
    vp = params["visual"]
    x = _vit_embed(vp, images, config, dtype)
    plan = _fused_block_plan(config, dtype, merge_blocks)
    x = _apply_fused_blocks(vp, x, config, dtype, start=0,
                            stop=config.vision_layers, plan=plan,
                            interpret=interpret)
    cls_tok = x[:, 0, :]
    pre = _ln(cls_tok, vp["ln_post"]["scale"], vp["ln_post"]["bias"])
    if not project:
        return pre
    projected = pre @ jnp.asarray(vp["proj"], pre.dtype)
    return pre, projected


def peft_fused_prefix_len(config, unlocked_groups: int, mesh=None,
                          batch_size: int | None = None) -> int:
    """How many bottom visual blocks are FROZEN under ``unlocked_groups``
    (open_clip lock_image_tower semantics: groups = [stem] + L resblocks +
    [head]; the LAST n groups unlock).  Those blocks never receive
    gradients — XLA prunes their backward — so the PEFT train step can run
    them through the forward-only fused Pallas kernels
    (``vit_encode_hybrid`` / ``fast_siglip.siglip_encode_hybrid``).
    0 disables the hybrid (canonical module): non-TPU backends, non-ViT
    towers, and meshes with a sharded-weight axis (GSPMD cannot partition
    a ``pallas_call``; pure data-parallel meshes run the fused prefix per
    shard via ``shard_map`` — requires the batch to divide over ``data``,
    so pass ``batch_size`` when a mesh is given)."""
    from .siglip import SigLIPConfig

    if dispatch_backend() != "tpu":
        return 0
    if mesh is not None:
        shape = dict(mesh.shape)
        data = shape.get("data", 1)
        if any(v != 1 for k, v in shape.items() if k != "data"):
            return 0  # sharded weights (TP/pipeline): canonical module
        if batch_size is None or batch_size % data != 0:
            return 0
    if isinstance(config, CLIPConfig) and \
            getattr(config, "vision_tower", "") == "convnext":
        # REVERSED r5 (median-of-3 A/B/A, ab_peft_hybrid): under the
        # sig5-GELU fused kernels the hybrid now WINS across the family
        # — base_w b64 49.7 vs 76.2/76.3 ms/step (+53%), large_d b32
        # 33.5 vs 54.2/54.7 (+62%), xxlarge b16 53.5 vs 69-81.  (The r3
        # negative — hybrid 74.9 vs 60.9 at base_w — predates the
        # banded-dw and sig-GELU kernel generations.)  Auto dispatches
        # the ConvNeXt hybrid; finetune.fused_prefix 0 opts out.
        L = sum(config.vision_layers)
        return max(0, min(L, L + 1 - unlocked_groups))
    if not (isinstance(config, (CLIPConfig, SigLIPConfig))
            and config.is_vit):
        return 0
    if isinstance(config, SigLIPConfig) and config.vision_width <= 1024:
        # SigLIP-L-16-384 measured the hybrid a wash-to-negative (r5
        # median-of-3: 131.1 vs 103.2-116.9 ms/step at b16, groups=11)
        # — the SO400M win (+7%, r2) does not transfer to the narrower
        # tower, whose prefix also needs the conservative 4-hpg
        # grouping.  Auto keeps the canonical module; explicit
        # finetune.fused_prefix > 0 still opts in.
        return 0
    L = config.vision_layers
    return max(0, min(L, L + 1 - unlocked_groups))


def _shard_mapped_prefix(prefix_fn, weights, x, mesh):
    """Run a forward-only fused-prefix fn per data shard: GSPMD cannot
    partition a ``pallas_call``, but under a pure data-parallel mesh each
    device can run the kernels on its batch shard with replicated
    weights.  Forward-only is essential — ``shard_map`` here is never
    differentiated (the caller stop_gradients the prefix inputs)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(prefix_fn, mesh=mesh, in_specs=(P(), P("data")),
                     out_specs=P("data"), check_rep=False)(weights, x)


def vit_encode_hybrid(params, images: jax.Array, config: CLIPConfig,
                      n_prefix: int, *, project: bool = False,
                      dtype=jnp.bfloat16, interpret: bool = False,
                      mesh=None, qprefix=None):
    """PEFT-training encode: fused forward-only Pallas kernels for the
    ``n_prefix`` FROZEN bottom blocks (no gradients flow below the lowest
    trainable block — the canonical tower wastes its ~50%-MFU forward
    there while the fused stack runs at ~76%), then the canonical
    differentiable math for the trainable suffix.  ``stop_gradient``
    between the halves makes the no-backward contract explicit.  Forward
    parity with the canonical module is bf16-tolerance (the fused kernels
    are parity-tested to 5e-4); gradients of the suffix are exact.
    Under a pure data-parallel ``mesh`` the fused prefix runs per shard
    via ``shard_map`` (gate: ``peft_fused_prefix_len``); the suffix stays
    GSPMD-partitioned.

    ``qprefix`` (a pre-quantized {resblocks_i: quantize_vit_block(...)}
    dict) switches the frozen prefix to the WHOLE-BLOCK int8 kernels —
    the int8 MXU runs ~2x the bf16 rate, and the frozen trunk is exactly
    where quantization noise cannot touch a gradient (opt-in:
    ``finetune.fused_prefix_quant``)."""
    vp = params["visual"]
    x = _vit_embed(vp, images, config, dtype)
    if n_prefix > 0:
        from .quant_vit import apply_int8_vit_blocks

        # stop_gradient on the fused region's INPUTS (not just its output):
        # the Pallas kernels have no JVP rule, and JAX linearizes any op
        # whose inputs carry tangents even if the cotangent is later zero
        x_sg = jax.lax.stop_gradient(x)
        if qprefix is not None:
            w_sg = jax.lax.stop_gradient(qprefix)
            prefix_fn = lambda w, xs: apply_int8_vit_blocks(  # noqa: E731
                w, xs, config, start=0, stop=n_prefix, interpret=interpret)
        else:
            w_sg = jax.lax.stop_gradient(vp)
            prefix_fn = lambda w, xs: _apply_fused_blocks(  # noqa: E731
                w, xs, config, dtype, start=0, stop=n_prefix,
                interpret=interpret)
        if mesh is not None:
            x = _shard_mapped_prefix(prefix_fn, w_sg, x_sg, mesh)
        else:
            x = prefix_fn(w_sg, x_sg)
        x = x.astype(dtype)
    for i in range(n_prefix, config.vision_layers):
        blk = vp["transformer"][f"resblocks_{i}"]
        x = _canonical_clip_block(x, blk, config.vision_heads, dtype)
    cls_tok = x[:, 0, :]
    pre = _ln(cls_tok, vp["ln_post"]["scale"], vp["ln_post"]["bias"])
    if not project:
        return pre
    projected = pre @ jnp.asarray(vp["proj"], pre.dtype)
    return pre, projected
