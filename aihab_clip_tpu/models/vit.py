"""CLIP Vision Transformer tower (Flax).

Mirrors the reference tower semantics (`/root/reference/clip/model.py:199-235`)
with the pre-projection contract as an explicit API: ``__call__`` returns the
post-``ln_post`` CLS feature (pre-projection) and, when requested, the
projected embedding — instead of the reference's code-mutation that disables
``x @ proj``.

Layout is NHWC (TPU-native); the patchify conv maps directly onto the MXU.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, PatchEmbed, Transformer

Dtype = Any


class VisionTransformer(nn.Module):
    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    mlp_dim: int = 0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    patchify: str = "matmul"  # "matmul" | "conv" (identical math)
    act: str = "quick_gelu"   # open_clip/LAION towers use exact "gelu"

    @nn.compact
    def __call__(
        self, x: jax.Array, *, project: bool = False
    ) -> jax.Array | Tuple[jax.Array, jax.Array]:
        """x: [batch, H, W, 3] (NHWC). Returns pre-projection features,
        or (pre, projected) when ``project``."""
        scale = self.width ** -0.5
        x = x.astype(self.dtype)

        # patchify: stride = kernel = patch_size, no bias (matmul-formulated
        # by default — see layers.PatchEmbed)
        x = PatchEmbed(
            self.width,
            self.patch_size,
            use_bias=False,
            impl=self.patchify,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv1",
        )(x)
        b, gh, gw, w = x.shape
        x = x.reshape(b, gh * gw, w)

        class_embedding = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=scale),
            (self.width,),
            self.param_dtype,
        )
        cls = jnp.broadcast_to(
            class_embedding.astype(self.dtype)[None, None, :], (b, 1, w))
        x = jnp.concatenate([cls, x], axis=1)

        num_tokens = (self.input_resolution // self.patch_size) ** 2 + 1
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=scale),
            (num_tokens, self.width),
            self.param_dtype,
        )
        x = x + positional_embedding.astype(self.dtype)

        x = LayerNorm(param_dtype=self.param_dtype, name="ln_pre")(x)
        x = Transformer(
            self.width, self.layers, self.heads, mlp_dim=self.mlp_dim,
            dtype=self.dtype, param_dtype=self.param_dtype, remat=self.remat,
            act=self.act, name="transformer",
        )(x)

        pre = LayerNorm(param_dtype=self.param_dtype, name="ln_post")(x[:, 0, :])

        proj = self.param(
            "proj",
            nn.initializers.normal(stddev=scale),
            (self.width, self.output_dim),
            self.param_dtype,
        )
        if not project:
            return pre
        projected = pre @ proj.astype(pre.dtype)
        return pre, projected
