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


@pytest.mark.parametrize("tag,width,layers,res,vocab,patch", [
    ("ViT-B-16-SigLIP", 768, 12, 224, 32000, 16),
    ("ViT-B-16-SigLIP-384", 768, 12, 384, 32000, 16),
    ("ViT-B-16-SigLIP-512", 768, 12, 512, 32000, 16),
    ("ViT-B-32-SigLIP2-256", 768, 12, 256, 256000, 32),
    ("ViT-L-16-SigLIP-256", 1024, 24, 256, 32000, 16),
    ("ViT-L-16-SigLIP2-384", 1024, 24, 384, 256000, 16),
    ("ViT-L-16-SigLIP2-512", 1024, 24, 512, 256000, 16),
    ("ViT-SO400M-14-SigLIP", 1152, 27, 224, 32000, 14),
    ("ViT-SO400M-14-SigLIP2-378", 1152, 27, 378, 256000, 14),
    ("ViT-SO400M-16-SigLIP2-256", 1152, 27, 256, 256000, 16),
    ("ViT-SO400M-16-SigLIP2-512", 1152, 27, 512, 256000, 16),
])
def test_siglip_tag_grid_parses(tag, width, layers, res, vocab, patch):
    """The full open_clip SigLIP tag grid resolves to real dimensions,
    not the SO400M fallback (reference accepts any open_clip tag via the
    hub factory, /root/reference/aihab_utils/model_init.py:42-112)."""
    from aihab_clip_tpu.models.zoo import _siglip_arch_for

    name, cfg = _siglip_arch_for(f"hf-hub:timm/{tag}")
    assert name == tag
    assert cfg.vision_width == width
    assert cfg.vision_layers == layers
    assert cfg.image_resolution == res
    assert cfg.vocab_size == vocab
    assert cfg.patch_size == patch
    assert cfg.context_length == 64


def test_siglip_tag_grid_registry_consistency():
    """Parsed configs agree with the hand-written registry entries."""
    from aihab_clip_tpu.models.siglip import (SIGLIP_ARCHS,
                                              siglip_config_for_name)

    for tag in ("ViT-SO400M-16-SigLIP2-384", "ViT-B-16-SigLIP-224"):
        parsed = siglip_config_for_name(
            tag.replace("-224", ""))  # registry alias has explicit res
        reg = SIGLIP_ARCHS[tag]
        assert parsed.vision_width == reg.vision_width
        assert parsed.vision_layers == reg.vision_layers
        assert parsed.vision_mlp_dim == reg.vision_mlp_dim
        assert parsed.vocab_size == reg.vocab_size


def test_siglip_tag_outside_grid_falls_back():
    from aihab_clip_tpu.models.zoo import _siglip_arch_for

    name, cfg = _siglip_arch_for("hf-hub:timm/ViT-gopt-16-SigLIP2-384")
    assert name == "ViT-SO400M-16-SigLIP2-384"  # documented default
    name, cfg = _siglip_arch_for("hf-hub:timm/ViT-B-16-plain")
    assert name is None and cfg is None


@pytest.mark.slow
def test_siglip_parsed_tag_random_init_runs():
    """A parsed (non-registry) tag builds and encodes end to end."""
    from aihab_clip_tpu.models import load

    bundle = load("random:ViT-B-32-SigLIP2-256", seed=0)
    assert bundle.config.vision_width == 768
    assert bundle.config.patch_size == 32
    assert bundle.config.image_resolution == 256
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    feats = bundle.model.apply({"params": bundle.params}, x,
                               method=type(bundle.model).encode_image)
    assert feats.shape == (1, bundle.config.embed_dim)
