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
Exact GELU is computed in-kernel via the fast f32 approximation
(`block_kernel.gelu_fast_f32` — default sigmoid-of-odd-poly, |err| <=
3.4e-6; `AIHAB_ERF_IMPL=rational|cheb` restores the erf forms) because
Mosaic has no erf lowering.

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


def _stem(vis, x):
    x = _conv(x, vis["stem_conv"], stride=4, padding="VALID")
    return _ln_f32(x, vis["stem_norm"]["scale"], vis["stem_norm"]["bias"])


def _block_jnp(blk, x):
    """One differentiable ConvNeXt block in plain jnp — the canonical
    module's math (LN f32, exact-erf GELU), used for the trainable
    suffix of the PEFT hybrid."""
    b_, h_, w_, c_ = x.shape
    y = _conv(x, blk["dwconv"], stride=1, padding="SAME", groups=c_)
    y = _ln_f32(y, blk["norm"]["scale"], blk["norm"]["bias"], eps=1e-6)
    y = y @ blk["fc1"]["kernel"].astype(x.dtype) \
        + blk["fc1"]["bias"].astype(x.dtype)
    y = jax.nn.gelu(y, approximate=False)
    y = y @ blk["fc2"]["kernel"].astype(x.dtype) \
        + blk["fc2"]["bias"].astype(x.dtype)
    return x + y * blk["gamma"].astype(x.dtype)


# per-layer cap on the banded dw matrix (80 MB covers S=256 at C=512 —
# base_w stage 2 — and excludes S=400 at the _320 resolutions whose
# 164 MB/layer A traffic would exceed the conv it replaces)
DW_MAT_MAX_BYTES = 80 * 2 ** 20


def _banded_dw_matrix(kernel: "np.ndarray", sp: int):
    """[7,7,1,C] depthwise kernel -> banded A [C, S, S] (S = sp*sp), SAME
    zero padding encoded in the band structure — exact math.  Host-side
    numpy; run once at load/dispatch time."""
    import numpy as np

    k = np.asarray(kernel, np.float32)[:, :, 0, :]
    kh, kw, c = k.shape
    s = sp * sp
    a = np.zeros((c, s, s), np.float32)
    oi, oj = np.meshgrid(np.arange(sp), np.arange(sp), indexing="ij")
    t_flat = oi * sp + oj
    for dy in range(kh):
        for dx in range(kw):
            ii = oi + dy - kh // 2
            jj = oj + dx - kw // 2
            m = (ii >= 0) & (ii < sp) & (jj >= 0) & (jj < sp)
            a[:, t_flat[m], (ii * sp + jj)[m]] = k[dy, dx][:, None]
    return a


def build_dw_matrices(params, config, *, dtype=jnp.bfloat16,
                      max_bytes: int = DW_MAT_MAX_BYTES):
    """Precompute banded dw-conv matrices for every block whose spatial
    map is small enough (stage 2/3 at the 256 resolutions): the
    contraction-free depthwise 7x7 becomes a c-batched [B,S]x[S,S] MXU
    GEMM — measured ~4x over XLA's depthwise lowering at stage-2 shapes
    (tools_dev/ab_convnext_dw.py, r4).  Returns {block_key: A [C, S, S]}
    or None; pass as ``dwmat=`` to the fused encode.  MUST be built
    OUTSIDE jit (scattering A in-jit costs ~2x the win in HBM writes)."""
    import numpy as np

    vis = params["visual"]
    res = config.image_resolution
    out = {}
    for s, depth in enumerate(tuple(config.vision_layers)):
        sp = res // 4 // 2 ** s
        for b in range(depth):
            key = f"stage{s}_block{b}"
            kern = vis[key]["dwconv"]["kernel"]
            c = kern.shape[-1]
            nbytes = c * (sp * sp) ** 2 * jnp.dtype(dtype).itemsize
            if nbytes > max_bytes:
                continue
            out[key] = jnp.asarray(
                _banded_dw_matrix(np.asarray(kern), sp), dtype)
    return out or None


def _dw(blk, x, amat):
    """Depthwise 7x7: banded-matmul form when ``amat`` is provided, XLA
    conv otherwise."""
    b_, h_, w_, c_ = x.shape
    if amat is None:
        return _conv(x, blk["dwconv"], stride=1, padding="SAME", groups=c_)
    flat = x.reshape(b_, h_ * w_, c_)
    y = jnp.einsum("bsc,cts->btc", flat, amat.astype(x.dtype))
    return (y + blk["dwconv"]["bias"].astype(x.dtype)).reshape(
        b_, h_, w_, c_)


def quantize_convnext_mlp(params, config):
    """Per-block int8 (w8, scale) pairs for fc1/fc2 (jnp ops — load time
    or in-jit).  Convs, LNs, gamma, stem and head stay bf16/f32."""
    from ..ops.quant import quantize_weight

    vis = params["visual"]
    q = {}
    for s, depth in enumerate(tuple(config.vision_layers)):
        for b in range(depth):
            blk = vis[f"stage{s}_block{b}"]
            w1_8, s1 = quantize_weight(blk["fc1"]["kernel"])
            w2_8, s2 = quantize_weight(blk["fc2"]["kernel"])
            q[f"stage{s}_block{b}"] = {
                "fc1": {"w8": w1_8, "scale": s1},
                "fc2": {"w8": w2_8, "scale": s2},
            }
    return q


def apply_convnext_blocks(vis, x: jax.Array, config, *, start: int,
                          stop: int, fused: bool = True,
                          qmlp=None, dwmat=None, interpret: bool = False):
    """Run ConvNeXt trunk blocks [start, stop) (GLOBAL depth-order index
    over all stages) on ``x``, applying each stage's downsample before
    its first in-range block (a stage's downsample belongs to its first
    block's lock group — `train/peft._convnext_group_of`).  ``x`` must be
    the activation just before block ``start``.  ``fused`` runs the MLP
    halves through the forward-only Pallas kernel; ``fused=False`` is the
    differentiable jnp formulation."""
    depths = tuple(config.vision_layers)
    k = 0
    for s, depth in enumerate(depths):
        for b in range(depth):
            if k >= stop:
                return x
            if k >= start:
                if s and b == 0:
                    dn = vis[f"down_norm_{s}"]
                    x = _ln_f32(x, dn["scale"], dn["bias"])
                    x = _conv(x, vis[f"down_conv_{s}"], stride=2,
                              padding="VALID")
                blk = vis[f"stage{s}_block{b}"]
                amat = None if dwmat is None else \
                    dwmat.get(f"stage{s}_block{b}")
                if not fused:
                    x = _block_jnp(blk, x)
                elif qmlp is not None:
                    from ..ops.quant_matmul import quant_convnext_mlp_block

                    qb = qmlp[f"stage{s}_block{b}"]
                    b_, h_, w_, c_ = x.shape
                    y = _dw(blk, x, amat)
                    out = quant_convnext_mlp_block(
                        y.reshape(b_ * h_ * w_, c_),
                        x.reshape(b_ * h_ * w_, c_),
                        blk["norm"]["scale"], blk["norm"]["bias"],
                        qb["fc1"]["w8"], qb["fc1"]["scale"],
                        blk["fc1"]["bias"],
                        qb["fc2"]["w8"], qb["fc2"]["scale"],
                        blk["fc2"]["bias"],
                        blk["gamma"], interpret=interpret)
                    x = out.reshape(b_, h_, w_, c_)
                else:
                    b_, h_, w_, c_ = x.shape
                    y = _dw(blk, x, amat)
                    out = convnext_mlp_block(
                        y.reshape(b_ * h_ * w_, c_),
                        x.reshape(b_ * h_ * w_, c_),
                        blk["norm"]["scale"], blk["norm"]["bias"],
                        blk["fc1"]["kernel"].astype(x.dtype),
                        blk["fc1"]["bias"],
                        blk["fc2"]["kernel"].astype(x.dtype),
                        blk["fc2"]["bias"],
                        blk["gamma"], interpret=interpret)
                    x = out.reshape(b_, h_, w_, c_)
            k += 1
    return x


def _head(vis, x, *, project: bool):
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


def convnext_encode_fused(params, x: jax.Array, config, *,
                          project: bool = False, dtype=None,
                          qmlp=None, dwmat=None, interpret: bool = False):
    """params: the CLIP tree (``params['visual']`` = ConvNeXt tower);
    x: [B, H, W, 3] preprocessed images.  Returns pre-projection features
    or ``(pre, projected)`` — the framework-wide contract.  ``qmlp``
    (from :func:`quantize_convnext_mlp`) switches every block MLP to the
    W8A8 int8 kernel (the serving density path); convs stay bf16."""
    vis = params["visual"]
    if dtype is not None:
        x = x.astype(dtype)
    x = _stem(vis, x)
    x = apply_convnext_blocks(vis, x, config, start=0,
                              stop=sum(config.vision_layers),
                              fused=True, qmlp=qmlp, dwmat=dwmat,
                              interpret=interpret)
    return _head(vis, x, project=project)


def convnext_encode_hybrid(params, images: jax.Array, config,
                           n_prefix: int, *, project: bool = False,
                           dtype=None, interpret: bool = False, mesh=None):
    """PEFT-training encode for ConvNeXt towers: the stem + ``n_prefix``
    FROZEN bottom blocks run the forward-only fused kernels under
    ``stop_gradient`` (no gradients flow below the lowest trainable
    group), then the differentiable jnp formulation for the trainable
    suffix + head.  The ViT/SigLIP hybrid recipe
    (`fast_vit.vit_encode_hybrid`) applied to the ConvNeXt trunk; under
    a pure data-parallel ``mesh`` the prefix runs per shard via
    ``shard_map``."""
    vis = params["visual"]
    if dtype is not None:
        images = images.astype(dtype)
    total = sum(config.vision_layers)
    if n_prefix > 0:
        from .fast_vit import _shard_mapped_prefix

        x_sg = jax.lax.stop_gradient(images)
        w_sg = jax.lax.stop_gradient(vis)

        def prefix_fn(w, xs):
            h = _stem(w, xs)
            return apply_convnext_blocks(w, h, config, start=0,
                                         stop=n_prefix, fused=True,
                                         interpret=interpret)

        if mesh is not None:
            x = _shard_mapped_prefix(prefix_fn, w_sg, x_sg, mesh)
        else:
            x = prefix_fn(w_sg, x_sg)
        if dtype is not None:
            x = x.astype(dtype)
    else:
        x = _stem(vis, images)
    x = apply_convnext_blocks(vis, x, config, start=n_prefix, stop=total,
                              fused=False)
    return _head(vis, x, project=project)
