"""Shared Flax building blocks for the CLIP towers.

Numerics contract (matching the reference semantics in
`/root/reference/clip/model.py`):
  * LayerNorm always computes in float32 and casts back (``:151-157``).
  * QuickGELU is ``x * sigmoid(1.702 x)`` (``:160-162``).
  * Attention uses a packed in-projection and a causal mask for the text
    tower (``:323-329``).

TPU notes: attention goes through ``jax.nn.dot_product_attention`` so XLA
can fuse the softmax pipeline onto the MXU/VPU; matmul compute dtype is a
module knob (bf16 on TPU) while LayerNorm stays fp32.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32, output cast back to the input dtype."""

    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (dim,), self.param_dtype)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(orig_dtype)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class PatchEmbed(nn.Module):
    """Stride = kernel = patch_size patchify stem.

    A stride=p conv over non-overlapping p×p patches IS a reshape+matmul;
    ``impl="matmul"`` keeps the stem on the plain GEMM path (one
    [B·S, p²·3]×[p²·3, W] contraction the MXU tiles directly), while
    ``impl="conv"`` lowers through ``lax.conv_general_dilated`` — identical
    math and an identical ``kernel``/``bias`` param layout (HWIO, matching
    ``nn.Conv`` and the torch/HF checkpoint converters) either way.
    """

    features: int
    patch_size: int
    use_bias: bool = False
    impl: str = "matmul"  # "matmul" | "conv"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [batch, H, W, C] -> [batch, H/p, W/p, features]
        p = self.patch_size
        b, h, w, c = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (p, p, c, self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), self.param_dtype)
                if self.use_bias else None)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if self.impl == "conv":
            y = jax.lax.conv_general_dilated(
                x, kernel, (p, p), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            gh, gw = h // p, w // p
            patches = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
            patches = patches.reshape(b, gh * gw, p * p * c)
            y = patches @ kernel.reshape(p * p * c, self.features)
            y = y.reshape(b, gh, gw, self.features)
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


class MultiHeadAttention(nn.Module):
    """Packed-QKV multi-head self-attention (torch ``nn.MultiheadAttention``
    layout: one ``in_proj`` of width 3W, one ``out_proj``)."""

    num_heads: int
    causal: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [batch, seq, width]
        width = x.shape[-1]
        head_dim = width // self.num_heads
        if head_dim * self.num_heads != width:
            raise ValueError(f"width {width} not divisible by heads {self.num_heads}")

        qkv = nn.Dense(3 * width, dtype=self.dtype, param_dtype=self.param_dtype,
                       name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # fused Pallas kernel on TPU (non-causal short sequences); XLA
        # dot_product_attention elsewhere — see ops/attention.py
        from ..ops.attention import attention

        out = attention(q, k, v, self.num_heads, causal=self.causal)
        return nn.Dense(width, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="out_proj")(out)


def resolve_act(name: str) -> Callable[[jax.Array], jax.Array]:
    """Activation by name: ``quick_gelu`` (OpenAI CLIP), ``gelu`` (exact
    erf — open_clip/LAION towers default to ``nn.GELU``), ``gelu_tanh``
    (SigLIP)."""
    if name == "quick_gelu":
        return quick_gelu
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_tanh":
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation {name!r}")


class MLP(nn.Module):
    """Transformer MLP: c_fc -> act -> c_proj (4x expansion unless
    ``mlp_dim`` overrides it — ViT-g style towers use ~4.36x)."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    expansion: int = 4
    mlp_dim: int = 0  # 0 = expansion * width
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        width = x.shape[-1]
        hidden = self.mlp_dim or self.expansion * width
        h = nn.Dense(hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="c_fc")(x)
        h = resolve_act(self.act)(h)
        return nn.Dense(width, dtype=self.dtype, param_dtype=self.param_dtype,
                        name="c_proj")(h)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block: x + attn(ln1(x)); x + mlp(ln2(x))."""

    num_heads: int
    causal: bool = False
    mlp_dim: int = 0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + MultiHeadAttention(
            self.num_heads, causal=self.causal, dtype=self.dtype,
            param_dtype=self.param_dtype, name="attn")(
                LayerNorm(param_dtype=self.param_dtype, name="ln_1")(x))
        x = x + MLP(dtype=self.dtype, param_dtype=self.param_dtype,
                    mlp_dim=self.mlp_dim, act=self.act,
                    name="mlp")(LayerNorm(param_dtype=self.param_dtype,
                                          name="ln_2")(x))
        return x


class Transformer(nn.Module):
    """Stack of residual attention blocks."""

    width: int
    layers: int
    heads: int
    causal: bool = False
    mlp_dim: int = 0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        block_cls = ResidualAttentionBlock
        if self.remat:
            # trade FLOPs for HBM during fine-tuning of deep towers
            block_cls = nn.remat(ResidualAttentionBlock)
        for i in range(self.layers):
            x = block_cls(self.heads, causal=self.causal,
                          mlp_dim=self.mlp_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, act=self.act,
                          name=f"resblocks_{i}")(x)
        return x
