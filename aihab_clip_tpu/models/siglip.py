"""SigLIP-style towers (Flax): MAP-pooled vision transformer + non-causal
text tower.

Covers the reference's default ``openclip`` backbone family
(``hf-hub:timm/ViT-SO400M-16-SigLIP2-384``, `/root/reference/configs/base.yaml:33`)
with a TPU-native implementation:

  * vision: patchify conv (with bias) + learned position embeddings (no CLS
    token), pre-LN transformer blocks with tanh-GELU and a *configurable*
    MLP width (SO400M uses 4304, not 4x), and a MAP attention-pool head
    (learnable probe attends over all patch tokens, then LN + residual MLP);
  * text: token + position embeddings, non-causal blocks, final LN,
    last-token pooling, dense output head;
  * the param tree uses the same ``visual``/``text`` top-level naming and
    ``transformer/resblocks_i`` block naming as the CLIP towers so the PEFT
    lock-mask group semantics apply unchanged.

Weight ingestion from a local HuggingFace ``SiglipModel`` snapshot is in
``convert_hf.py``; without local weights the towers random-init (zero-egress
environments).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import LayerNorm, PatchEmbed

Dtype = Any


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    embed_dim: int               # output embedding width (= vision width)
    image_resolution: int
    patch_size: int
    vision_width: int
    vision_layers: int
    vision_heads: int
    vision_mlp_dim: int
    context_length: int
    vocab_size: int
    text_width: int
    text_layers: int
    text_heads: int
    text_mlp_dim: int

    # API compat with CLIPConfig consumers
    @property
    def is_vit(self) -> bool:
        return True

    @property
    def transformer_layers(self) -> int:
        return self.text_layers

    @property
    def vision_preproj_dim(self) -> int:
        return self.vision_width


# Named SigLIP architectures (public shape facts).
SIGLIP_ARCHS: Dict[str, SigLIPConfig] = {
    # SigLIP / SigLIP2 SO400M patch16 @384
    "ViT-SO400M-16-SigLIP2-384": SigLIPConfig(
        embed_dim=1152, image_resolution=384, patch_size=16,
        vision_width=1152, vision_layers=27, vision_heads=16,
        vision_mlp_dim=4304,
        context_length=64, vocab_size=256000,
        text_width=1152, text_layers=27, text_heads=16, text_mlp_dim=4304),
    "ViT-B-16-SigLIP-224": SigLIPConfig(
        embed_dim=768, image_resolution=224, patch_size=16,
        vision_width=768, vision_layers=12, vision_heads=12,
        vision_mlp_dim=3072,
        context_length=64, vocab_size=32000,
        text_width=768, text_layers=12, text_heads=12, text_mlp_dim=3072),
    # tiny smoke arch
    "SigLIP-Tiny": SigLIPConfig(
        embed_dim=64, image_resolution=32, patch_size=8,
        vision_width=64, vision_layers=2, vision_heads=2, vision_mlp_dim=128,
        context_length=16, vocab_size=49408,
        text_width=64, text_layers=2, text_heads=2, text_mlp_dim=128),
}

# tower dimensions per open_clip/timm size token; the full tag grid
# (size x patch x SigLIP1/2 x resolution) is derived by
# ``siglip_config_for_name`` instead of enumerating every combination
# (the reference accepts any open_clip tag via the hub factory,
# /root/reference/aihab_utils/model_init.py:42-112 — this is the
# zero-egress equivalent for the SigLIP families)
_SIGLIP_TOWER_DIMS = {
    # size: (width, layers, heads, mlp_dim)
    "B": (768, 12, 12, 3072),
    "L": (1024, 24, 16, 4096),
    "SO400M": (1152, 27, 16, 4304),
}
_SIGLIP_DEFAULT_RES = {"B": 224, "L": 256, "SO400M": 224}


def siglip_config_for_name(name: str) -> Optional[SigLIPConfig]:
    """Parse an open_clip/timm SigLIP tag into a config.

    Accepts ``ViT-<SIZE>-<PATCH>-SigLIP[2][-<RES>]`` (e.g.
    ``ViT-L-16-SigLIP-384``, ``ViT-SO400M-14-SigLIP2-378``).  Text tower
    mirrors the vision dims (the SigLIP family trains matched towers);
    vocab is 32_000 for SigLIP1 (c4-en sentencepiece) and 256_000 for
    SigLIP2 (Gemma tokenizer), context 64 for both.  Returns None for
    tags outside the grid — callers fall through to their own defaults.

    Known hole: SigLIP1's ``ViT-SO400M-14-SigLIP-384`` uses a
    non-divisible 384/14 grid (the conv stride floors to 27x27 patches);
    our PatchEmbed requires divisibility, so that one tag is rejected
    here (a local HF snapshot still works — the config then comes from
    ``siglip_config_from_hf``).
    """
    m = re.fullmatch(
        r"ViT-(B|L|SO400M)-(\d+)-SigLIP(2?)(?:-(\d+))?", name)
    if m is None:
        return None
    size, patch, two, res = m.group(1), int(m.group(2)), m.group(3), \
        m.group(4)
    width, layers, heads, mlp = _SIGLIP_TOWER_DIMS[size]
    resolution = int(res) if res else _SIGLIP_DEFAULT_RES[size]
    if resolution % patch:
        return None
    return SigLIPConfig(
        embed_dim=width, image_resolution=resolution, patch_size=patch,
        vision_width=width, vision_layers=layers, vision_heads=heads,
        vision_mlp_dim=mlp,
        context_length=64, vocab_size=256000 if two else 32000,
        text_width=width, text_layers=layers, text_heads=heads,
        text_mlp_dim=mlp)


class SigLIPMLP(nn.Module):
    hidden_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        width = x.shape[-1]
        h = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="c_fc")(x)
        h = gelu_tanh(h)
        return nn.Dense(width, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="c_proj")(h)


class SigLIPAttention(nn.Module):
    """Separate q/k/v/out projections (HF Siglip layout)."""

    num_heads: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    use_fused: bool | None = None  # None = measured-crossover dispatch

    @nn.compact
    def __call__(self, q_in: jax.Array, kv_in: Optional[jax.Array] = None
                 ) -> jax.Array:
        kv_in = q_in if kv_in is None else kv_in
        width = q_in.shape[-1]
        head_dim = width // self.num_heads
        dense = lambda name: nn.Dense(  # noqa: E731
            width, dtype=self.dtype, param_dtype=self.param_dtype, name=name)

        q = dense("q_proj")(q_in)
        k = dense("k_proj")(kv_in)
        v = dense("v_proj")(kv_in)

        if q_in.shape[1] == kv_in.shape[1]:
            from ..ops.attention import attention

            out = attention(q, k, v, self.num_heads,
                            use_fused=self.use_fused)
        else:  # cross-attention (MAP probe): single-query XLA path
            def heads(t):
                return t.reshape(*t.shape[:-1], self.num_heads, head_dim)

            out = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
            out = out.reshape(*q_in.shape[:-1], width)
        return dense("out_proj")(out)


class SigLIPBlock(nn.Module):
    num_heads: int
    mlp_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x + SigLIPAttention(
            self.num_heads, dtype=self.dtype, param_dtype=self.param_dtype,
            name="attn")(LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype,
                                   name="ln_1")(x))
        x = x + SigLIPMLP(self.mlp_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="mlp")(
            LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype, name="ln_2")(x))
        return x


class SigLIPTransformer(nn.Module):
    layers: int
    heads: int
    mlp_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        block = nn.remat(SigLIPBlock) if self.remat else SigLIPBlock
        for i in range(self.layers):
            x = block(self.heads, self.mlp_dim, dtype=self.dtype,
                      param_dtype=self.param_dtype, name=f"resblocks_{i}")(x)
        return x


class MAPHead(nn.Module):
    """Multihead attention pooling: learnable probe attends over tokens."""

    num_heads: int
    mlp_dim: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jax.Array) -> jax.Array:
        b, _, width = tokens.shape
        probe = self.param("probe", nn.initializers.xavier_uniform(),
                           (1, 1, width), self.param_dtype)
        probe = jnp.broadcast_to(probe.astype(tokens.dtype), (b, 1, width))
        x = SigLIPAttention(self.num_heads, dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name="attn")(probe, tokens)
        y = LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype, name="ln")(x)
        x = x + SigLIPMLP(self.mlp_dim, dtype=self.dtype,
                          param_dtype=self.param_dtype, name="mlp")(y)
        return x[:, 0, :]


class SigLIPVisionTower(nn.Module):
    config: SigLIPConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False
    patchify: str = "matmul"  # "matmul" | "conv" (identical math)

    @nn.compact
    def __call__(self, x: jax.Array, *, project: bool = False):
        cfg = self.config
        x = x.astype(self.dtype)
        x = PatchEmbed(cfg.vision_width, cfg.patch_size, use_bias=True,
                       impl=self.patchify, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv1")(x)
        b, gh, gw, w = x.shape
        x = x.reshape(b, gh * gw, w)

        num_tokens = (cfg.image_resolution // cfg.patch_size) ** 2
        pos = self.param("positional_embedding",
                         nn.initializers.normal(stddev=w ** -0.5),
                         (num_tokens, w), self.param_dtype)
        x = x + pos.astype(x.dtype)

        x = SigLIPTransformer(cfg.vision_layers, cfg.vision_heads,
                              cfg.vision_mlp_dim, dtype=self.dtype,
                              param_dtype=self.param_dtype, remat=self.remat,
                              name="transformer")(x)
        x = LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype, name="ln_post")(x)
        pooled = MAPHead(cfg.vision_heads, cfg.vision_mlp_dim,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="attnpool")(x)
        # SigLIP has no separate vision projection: pooled IS the embedding.
        if project:
            return pooled, pooled
        return pooled


class SigLIPTextTower(nn.Module):
    config: SigLIPConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, tokens: jax.Array) -> Tuple[jax.Array, jax.Array]:
        cfg = self.config
        embedding = self.param("token_embedding",
                               nn.initializers.normal(stddev=0.02),
                               (cfg.vocab_size, cfg.text_width),
                               self.param_dtype)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(stddev=0.01),
                         (cfg.context_length, cfg.text_width),
                         self.param_dtype)
        x = embedding[tokens].astype(self.dtype)
        x = x + pos.astype(x.dtype)
        x = SigLIPTransformer(cfg.text_layers, cfg.text_heads,
                              cfg.text_mlp_dim, dtype=self.dtype,
                              param_dtype=self.param_dtype, remat=self.remat,
                              name="transformer")(x)
        x = LayerNorm(epsilon=1e-6, param_dtype=self.param_dtype, name="ln_final")(x)
        pre = x[:, -1, :]  # SigLIP pools the LAST token (fixed-pad inputs)
        projected = nn.Dense(cfg.embed_dim, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="head")(pre)
        return pre, projected


class SigLIPModel(nn.Module):
    """Combined SigLIP model exposing the same encode API as CLIPModel."""

    config: SigLIPConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    remat: bool = False

    def setup(self):
        self.visual = SigLIPVisionTower(self.config, dtype=self.dtype,
                                        param_dtype=self.param_dtype,
                                        remat=self.remat)
        self.text = SigLIPTextTower(self.config, dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    remat=self.remat)
        self.logit_scale = self.param(
            "logit_scale", lambda key, shape: jnp.full(shape, 1.0, jnp.float32),
            ())
        self.logit_bias = self.param(
            "logit_bias", lambda key, shape: jnp.zeros(shape, jnp.float32), ())

    def encode_image(self, images: jax.Array, *, project: bool = False):
        return self.visual(images, project=project)

    def encode_text(self, tokens: jax.Array):
        return self.text(tokens)

    def __call__(self, images: jax.Array, tokens: jax.Array):
        """Pairwise sigmoid logits (SigLIP objective):
        t * cos(img, txt) + b."""
        _, img = self.visual(images, project=True)
        _, txt = self.text(tokens)
        img = img / jnp.maximum(jnp.linalg.norm(img, axis=-1, keepdims=True),
                                1e-12)
        txt = txt / jnp.maximum(jnp.linalg.norm(txt, axis=-1, keepdims=True),
                                1e-12)
        return (jnp.exp(self.logit_scale) * img @ txt.T + self.logit_bias)


def siglip_normalize_stats():
    """SigLIP checkpoints use 0.5/0.5 normalization, not CLIP stats."""
    return (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
