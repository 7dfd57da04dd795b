"""CLIP text transformer tower (Flax).

Mirrors the reference semantics (`/root/reference/clip/model.py:277-353`):
token embedding + positional embedding -> causal transformer -> ln_final ->
pool at the EOT position (argmax of token ids) -> (pre-projection,
projected) pair, which the reference exposes by modifying ``encode_text``
(:350-353). Here the pair is the first-class return contract.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, Transformer

Dtype = Any


class TextTransformer(nn.Module):
    context_length: int
    vocab_size: int
    width: int
    layers: int
    heads: int
    embed_dim: int
    mlp_dim: int = 0
    causal: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, tokens: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """tokens: [batch, context_length] int32.

        Returns (pre_projection [B, width], projected [B, embed_dim])."""
        token_embedding = self.param(
            "token_embedding",
            nn.initializers.normal(stddev=0.02),
            (self.vocab_size, self.width),
            self.param_dtype,
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.width),
            self.param_dtype,
        )
        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (self.width, self.embed_dim),
            self.param_dtype,
        )

        x = token_embedding[tokens].astype(self.dtype)
        x = x + positional_embedding.astype(self.dtype)
        x = Transformer(
            self.width, self.layers, self.heads, causal=self.causal,
            mlp_dim=self.mlp_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, remat=self.remat,
            act=self.act, name="transformer",
        )(x)
        x = LayerNorm(param_dtype=self.param_dtype, name="ln_final")(x)

        # EOT pooling: the EOT token id is the highest in each sequence.
        eot_pos = jnp.argmax(tokens, axis=-1)
        pre = jnp.take_along_axis(x, eot_pos[:, None, None], axis=1)[:, 0, :]
        projected = pre @ text_projection.astype(pre.dtype)
        return pre, projected
