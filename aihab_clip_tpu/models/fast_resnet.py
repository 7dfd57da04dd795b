"""Folded-BatchNorm ModifiedResNet encode (forward-only TPU fast path).

Every BatchNorm in the RN tower is FROZEN (inference statistics as
parameters, `models/resnet.py:27-46`) — so each (conv, bn) pair folds
exactly into one conv with bias at load time:

    a       = scale * rsqrt(var + eps)          (per output channel)
    kernel' = kernel * a
    bias'   = bias - mean * a

Mathematically exact in f32 (the fold is computed in f32; the folded
kernel is then cast to the compute dtype, so bf16 towers see one extra
bf16 rounding on the kernel — bounded by the tower's existing bf16
parity tolerances).  VERDICT r3 item 3: the canonical tower applies each
FrozenBatchNorm as a separate elementwise op; folding removes ~2
elementwise HBM passes per conv.

The attention pool and overall semantics mirror the canonical module
(`models/resnet.py`, reference `/root/reference/clip/model.py:10-148`);
parity-tested in ``tests/test_fast_resnet.py``.  Forward-only — ProLIP
trains only the projector, so the RN tower never needs gradients through
this path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fold_pair(conv_p, bn_p, eps: float = 1e-5):
    """(conv kernel [kh,kw,in,out], frozen-bn params) -> (kernel', bias')
    in f32."""
    k = jnp.asarray(conv_p["kernel"], jnp.float32)
    a = jnp.asarray(bn_p["scale"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(bn_p["var"], jnp.float32) + eps)
    bias = jnp.asarray(bn_p["bias"], jnp.float32) - \
        jnp.asarray(bn_p["mean"], jnp.float32) * a
    return k * a[None, None, None, :], bias


def fold_resnet_bn(vis, dtype=jnp.bfloat16):
    """Canonical RN visual param tree -> folded tree: every (conv, bn)
    pair becomes {'kernel': folded, 'bias': folded} in ``dtype`` (bias
    stays f32); attnpool passes through unchanged.  Pure jnp — run once
    at dispatch/load time (params are static for encode)."""
    out = {}
    for stem in ("1", "2", "3"):
        k, b = _fold_pair(vis[f"conv{stem}"], vis[f"bn{stem}"])
        out[f"conv{stem}"] = {"kernel": k.astype(dtype), "bias": b}
    for name, blk in vis.items():
        if not name.startswith("layer"):
            continue
        fb = {}
        for ci in ("1", "2", "3"):
            k, b = _fold_pair(blk[f"conv{ci}"], blk[f"bn{ci}"])
            fb[f"conv{ci}"] = {"kernel": k.astype(dtype), "bias": b}
        if "downsample_conv" in blk:
            k, b = _fold_pair(blk["downsample_conv"], blk["downsample_bn"])
            fb["downsample_conv"] = {"kernel": k.astype(dtype), "bias": b}
        out[name] = fb
    out["attnpool"] = vis["attnpool"]
    return out


def _conv(x, p, *, stride=1, pad=0):
    out = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"].astype(x.dtype)


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID") / (k * k)


def _bottleneck(fb, x, *, stride: int):
    inplanes = x.shape[-1]
    out = jax.nn.relu(_conv(x, fb["conv1"]))
    out = jax.nn.relu(_conv(out, fb["conv2"], pad=1))
    if stride > 1:
        out = _avg_pool(out, stride)
    out = _conv(out, fb["conv3"])
    identity = x
    if "downsample_conv" in fb:
        if stride > 1:
            identity = _avg_pool(x, stride)
        identity = _conv(identity, fb["downsample_conv"])
    else:
        assert stride == 1 and inplanes == out.shape[-1]
    return jax.nn.relu(out + identity)


def _attnpool(ap, x, heads: int, *, project: bool):
    """Single-query attention pool (`models/resnet.py:87-140` semantics:
    the attention output at the mean-token query, pre-projection)."""
    b, h, w, c = x.shape
    tokens = x.reshape(b, h * w, c)
    mean_tok = jnp.mean(tokens, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean_tok, tokens], axis=1)
    tokens = tokens + jnp.asarray(ap["positional_embedding"], tokens.dtype)

    def dense(t, p):
        return t @ jnp.asarray(p["kernel"], t.dtype) \
            + jnp.asarray(p["bias"], t.dtype)

    q = dense(tokens[:, :1, :], ap["q_proj"])
    k = dense(tokens, ap["k_proj"])
    v = dense(tokens, ap["v_proj"])
    head_dim = c // heads

    def split(t):
        return t.reshape(t.shape[0], t.shape[1], heads, head_dim)

    out = jax.nn.dot_product_attention(split(q), split(k), split(v))
    pre = out.reshape(b, c)
    if not project:
        return pre
    return pre, dense(pre, ap["c_proj"])


def resnet_encode_folded(folded_vis, x: jax.Array, config, *,
                         project: bool = False, dtype=jnp.bfloat16):
    """folded_vis: output of :func:`fold_resnet_bn`; x: [B, H, W, 3]
    preprocessed images.  Returns pre-projection features or
    ``(pre, projected)`` (the framework-wide contract)."""
    x = x.astype(dtype)
    x = jax.nn.relu(_conv(x, folded_vis["conv1"], stride=2, pad=1))
    x = jax.nn.relu(_conv(x, folded_vis["conv2"], pad=1))
    x = jax.nn.relu(_conv(x, folded_vis["conv3"], pad=1))
    x = _avg_pool(x, 2)
    strides = [1, 2, 2, 2]
    for stage, (n_blocks, s) in enumerate(
            zip(tuple(config.vision_layers), strides), 1):
        for blk in range(n_blocks):
            x = _bottleneck(folded_vis[f"layer{stage}_{blk}"], x,
                            stride=s if blk == 0 else 1)
    return _attnpool(folded_vis["attnpool"], x, config.vision_heads,
                     project=project)
