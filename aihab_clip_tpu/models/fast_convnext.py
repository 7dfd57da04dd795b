"""Fused ConvNeXt-CLIP encode (forward-only TPU fast path).

The canonical NHWC tower leaves the ConvNeXt MLP HBM-bound: the
[tokens, 4C] hidden activation round-trips HBM in every block, which is
where ~60% of the measured block time goes (BENCHMARKS.md "ConvNeXt-CLIP
encode": MLP halves at 17-34% effective MFU while the per-block GEMM
floor is 0.70 ms).  This module keeps the convolutions on XLA's
canonical lowering (stem / downsample / depthwise — conv is XLA's home
turf) and routes every block's LN -> fc1 -> exact-GELU -> fc2 -> gamma
-> residual through ONE Pallas kernel per row tile
(`ops/block_kernel.convnext_mlp_block`), holding the hidden in VMEM.
Exact-erf GELU is computed in-kernel via the f32 rational approximation
(`_erf_f32`, |err| <= 1.5e-7) because Mosaic has no erf lowering.

Forward-only, parity-tested against the canonical Flax tower
(`tests/test_convnext.py::TestFusedEncode`); training keeps the module.
Reference capability: the LAION ConvNeXt tags of
`/root/reference/aihab_utils/model_init.py:42-60` (the reference has no
fast path of its own — pure torch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.block_kernel import convnext_mlp_block


def _ln_f32(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * jnp.asarray(scale, jnp.float32) + jnp.asarray(bias, jnp.float32)
    return y.astype(x.dtype)


def _conv(x, p, *, stride, padding, groups=1):
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    return out + p["bias"].astype(x.dtype)


def convnext_encode_fused(params, x: jax.Array, config, *,
                          project: bool = False, dtype=None,
                          interpret: bool = False):
    """params: the CLIP tree (``params['visual']`` = ConvNeXt tower);
    x: [B, H, W, 3] preprocessed images.  Returns pre-projection features
    or ``(pre, projected)`` — the framework-wide contract."""
    vis = params["visual"]
    depths = tuple(config.vision_layers)
    if dtype is not None:
        x = x.astype(dtype)

    x = _conv(x, vis["stem_conv"], stride=4, padding="VALID")
    x = _ln_f32(x, vis["stem_norm"]["scale"], vis["stem_norm"]["bias"])
    for s, depth in enumerate(depths):
        if s:
            dn = vis[f"down_norm_{s}"]
            x = _ln_f32(x, dn["scale"], dn["bias"])
            x = _conv(x, vis[f"down_conv_{s}"], stride=2, padding="VALID")
        b_, h_, w_, c_ = x.shape
        for b in range(depth):
            blk = vis[f"stage{s}_block{b}"]
            y = _conv(x, blk["dwconv"], stride=1, padding="SAME", groups=c_)
            out = convnext_mlp_block(
                y.reshape(b_ * h_ * w_, c_), x.reshape(b_ * h_ * w_, c_),
                blk["norm"]["scale"], blk["norm"]["bias"],
                blk["fc1"]["kernel"].astype(x.dtype), blk["fc1"]["bias"],
                blk["fc2"]["kernel"].astype(x.dtype), blk["fc2"]["bias"],
                blk["gamma"], interpret=interpret)
            x = out.reshape(b_, h_, w_, c_)

    pooled = jnp.mean(x, axis=(1, 2))
    pre = _ln_f32(pooled, vis["head_norm"]["scale"], vis["head_norm"]["bias"])
    if not project:
        return pre
    if "head_fc1" in vis:                                   # mlp head (_d)
        y = pre @ vis["head_fc1"]["kernel"].astype(pre.dtype) \
            + vis["head_fc1"]["bias"].astype(pre.dtype)
        y = jax.nn.gelu(y, approximate=False)   # matches the Flax head
        y = y @ vis["head_fc2"]["kernel"].astype(pre.dtype) \
            + vis["head_fc2"]["bias"].astype(pre.dtype)
    else:
        y = pre @ vis["head_proj"]["kernel"].astype(pre.dtype) \
            + vis["head_proj"]["bias"].astype(pre.dtype)
    return pre, y
