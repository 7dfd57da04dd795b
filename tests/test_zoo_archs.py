"""Zoo architecture registry: every named config builds and runs a tiny
forward (shape contract), and config inference round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aihab_clip_tpu.models import CLIP_ARCHS, CLIPModel, available_models


def test_registry_covers_zoo_urls():
    for name in available_models():
        assert name in CLIP_ARCHS, f"zoo URL {name} has no arch config"


@pytest.mark.parametrize("name", ["RN50", "RN50x4", "ViT-B/32", "ViT-L/14"])
def test_arch_shapes(name):
    cfg = CLIP_ARCHS[name]
    assert cfg.vocab_size == 49408
    assert cfg.context_length == 77
    if cfg.is_vit:
        assert cfg.image_resolution % cfg.vision_patch_size == 0
    else:
        assert cfg.image_resolution % 32 == 0
        assert cfg.vision_preproj_dim == cfg.vision_width * 32


def test_rn50x4_eval_shape():
    """RN50x4 param shapes are consistent (eval_shape only — no init cost)."""
    cfg = CLIP_ARCHS["RN50x4"]
    model = CLIPModel(cfg)
    shapes = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
            jnp.zeros((1, 77), jnp.int32)),
        jax.random.key(0))
    p = shapes["params"]
    ap = p["visual"]["attnpool"]
    assert ap["c_proj"]["kernel"].shape == (cfg.vision_width * 32,
                                            cfg.embed_dim)
    assert p["text"]["text_projection"].shape == (cfg.transformer_width,
                                                  cfg.embed_dim)
    # stage block counts
    assert "layer3_9" in p["visual"] and "layer3_10" not in p["visual"]


def test_openclip_dashed_name_normalization():
    """The reference's openclip backend takes dashed arch names
    (ViT-B-16, ViT-L-14-336); the zoo maps them onto the OpenAI-style
    keys and leaves SigLIP / RN / random names untouched."""
    from aihab_clip_tpu.models.zoo import _normalize_openclip_name as norm

    assert norm("ViT-B-16") == "ViT-B/16"
    assert norm("ViT-B-32") == "ViT-B/32"
    assert norm("ViT-L-14") == "ViT-L/14"
    assert norm("ViT-L-14-336") == "ViT-L/14@336px"
    assert norm("random:ViT-B-16") == "random:ViT-B/16"
    assert norm("RN50") == "RN50"
    assert norm("random:Tiny") == "random:Tiny"
    assert (norm("hf-hub:timm/ViT-SO400M-16-SigLIP2-384")
            == "hf-hub:timm/ViT-SO400M-16-SigLIP2-384")
    assert (norm("ViT-SO400M-16-SigLIP2-384")
            == "ViT-SO400M-16-SigLIP2-384")


def test_load_accepts_dashed_names():
    from aihab_clip_tpu.models import load

    b = load("random:ViT-B-16", seed=0)
    assert b.config.vision_patch_size == 16
    assert b.config.image_resolution == 224


def test_patch_embed_matmul_matches_conv():
    """The matmul-formulated patchify stem is the conv stem, bit-for-bit
    math (modulo contraction order): same params, same outputs."""
    from aihab_clip_tpu.models.layers import PatchEmbed

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    for use_bias in (False, True):
        m_mat = PatchEmbed(16, 8, use_bias=use_bias, impl="matmul")
        m_conv = PatchEmbed(16, 8, use_bias=use_bias, impl="conv")
        params = m_mat.init(jax.random.key(0), x)
        y_mat = m_mat.apply(params, x)
        y_conv = m_conv.apply(params, x)
        assert y_mat.shape == (2, 4, 4, 16)
        np.testing.assert_allclose(np.asarray(y_mat), np.asarray(y_conv),
                                   atol=1e-5, rtol=1e-5)
