"""ModifiedResNet vision tower with QKV attention pooling (Flax, NHWC).

Reference semantics (`/root/reference/clip/model.py:10-148`):
  * 3-conv stem with average-pool (anti-aliased downsampling).
  * Bottleneck blocks whose strided convs are replaced by avgpool+conv.
  * Final pooling is an attention pool whose output projection is dropped to
    expose pre-projection features (`:82-89`); here that is simply the
    attention output at the query token — no code mutation needed.

BatchNorm is frozen (inference statistics as parameters): the reference only
ever runs this tower frozen (ProLIP tunes the projector on cached features),
so the running stats live in the ordinary param pytree, which keeps
freezing/conversion trivial.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics: y = (x - mean) * rsqrt(var+eps) * scale + bias."""

    features: int
    epsilon: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        shape = (self.features,)
        scale = self.param("scale", nn.initializers.ones, shape, self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, shape, self.param_dtype)
        mean = self.param("mean", nn.initializers.zeros, shape, self.param_dtype)
        var = self.param("var", nn.initializers.ones, shape, self.param_dtype)
        dtype = x.dtype
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.epsilon)
        y = (x.astype(jnp.float32) - mean.astype(jnp.float32)) * inv
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inplanes = x.shape[-1]
        out_planes = self.planes * self.expansion
        conv = lambda f, k, name, pad=0: nn.Conv(  # noqa: E731
            f, kernel_size=(k, k), use_bias=False,
            padding=((pad, pad), (pad, pad)),
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        out = conv(self.planes, 1, "conv1")(x)
        out = nn.relu(FrozenBatchNorm(self.planes, param_dtype=self.param_dtype,
                                      name="bn1")(out))
        out = conv(self.planes, 3, "conv2", pad=1)(out)
        out = nn.relu(FrozenBatchNorm(self.planes, param_dtype=self.param_dtype,
                                      name="bn2")(out))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride, self.stride),
                              (self.stride, self.stride))
        out = conv(out_planes, 1, "conv3")(out)
        out = FrozenBatchNorm(out_planes, param_dtype=self.param_dtype,
                              name="bn3")(out)

        identity = x
        if self.stride > 1 or inplanes != out_planes:
            identity = nn.avg_pool(x, (self.stride, self.stride),
                                   (self.stride, self.stride)) if self.stride > 1 else x
            identity = conv(out_planes, 1, "downsample_conv")(identity)
            identity = FrozenBatchNorm(out_planes, param_dtype=self.param_dtype,
                                       name="downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling over spatial positions.

    Returns the *pre-projection* pooled feature: the multi-head attention
    output at the mean-token query, before the output projection ``c_proj``
    (whose weights are still created for ProLIP's projector init).
    """

    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, project: bool = False):
        # x: [batch, H, W, C] -> tokens [batch, HW+1, C] with mean prepended
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        mean_tok = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)

        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.embed_dim ** -0.5),
            (self.spacial_dim ** 2 + 1, self.embed_dim),
            self.param_dtype,
        )
        tokens = tokens + positional_embedding.astype(tokens.dtype)

        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        # query = mean token only; keys/values over all positions.  The
        # attention output at the query position equals the full-attention
        # row 0, so the HWxHW attention matrix is never materialized.
        q = dense(self.embed_dim, "q_proj")(tokens[:, :1, :])
        k = dense(self.embed_dim, "k_proj")(tokens)
        v = dense(self.embed_dim, "v_proj")(tokens)

        head_dim = self.embed_dim // self.num_heads
        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, head_dim)

        out = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
        pre = out.reshape(b, self.embed_dim)

        c_proj = dense(self.output_dim, "c_proj")
        if project:
            return pre, c_proj(pre)
        # instantiate c_proj params even when unused (projector init source)
        _ = c_proj(jnp.zeros((1, self.embed_dim), self.dtype))
        return pre


class ModifiedResNet(nn.Module):
    layers: Tuple[int, int, int, int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, project: bool = False):
        """x: [batch, H, W, 3] NHWC -> pre-projection pooled features."""
        x = x.astype(self.dtype)
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, kernel_size=(k, k), strides=(s, s), use_bias=False,
            padding=((1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        # 3-layer stem
        x = nn.relu(FrozenBatchNorm(self.width // 2, param_dtype=self.param_dtype,
                                    name="bn1")(conv(self.width // 2, 3, 2, "conv1")(x)))
        x = nn.relu(FrozenBatchNorm(self.width // 2, param_dtype=self.param_dtype,
                                    name="bn2")(conv(self.width // 2, 3, 1, "conv2")(x)))
        x = nn.relu(FrozenBatchNorm(self.width, param_dtype=self.param_dtype,
                                    name="bn3")(conv(self.width, 3, 1, "conv3")(x)))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        # residual stages
        planes = [self.width, self.width * 2, self.width * 4, self.width * 8]
        strides = [1, 2, 2, 2]
        for stage, (n_blocks, p, s) in enumerate(zip(self.layers, planes, strides), 1):
            for blk in range(n_blocks):
                x = Bottleneck(
                    p, stride=s if blk == 0 else 1,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name=f"layer{stage}_{blk}")(x)

        embed_dim = self.width * 32
        return AttentionPool2d(
            self.input_resolution // 32, embed_dim, self.heads, self.output_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="attnpool",
        )(x, project=project)
