"""Real open_clip checkpoint-layout gates (VERDICT r2 item 7).

Zero-egress stand-ins for real LAION checkpoints: state dicts with the
REAL key layout (including open_clip export quirks — the persistent
``attn_mask`` buffer and optional DDP ``module.`` prefix) and, at full
scale, shape-only dicts with the REAL tensor shapes.  These would catch a
key-mapping or config-inference bug before real weights ever arrive.

Reference capability: `/root/reference/aihab_utils/model_init.py:42-112`
forwards any open_clip tag + ``open_clip_pretrained`` to the open_clip
hub; this repo's converters must accept what that hub serves.
"""

import numpy as np
import pytest

from aihab_clip_tpu.models import config_from_state_dict_shapes
from aihab_clip_tpu.models.clip import CLIP_ARCHS
from aihab_clip_tpu.models.convnext import convnext_config_from_shapes

# ---------------------------------------------------------------------------
# real key layouts (shape-only at full scale; no tensors allocated)
# ---------------------------------------------------------------------------


def openclip_vit_shapes(width, layers, patch, res, embed, t_width, t_layers,
                        mlp_dim=0, vocab=49408, ctx=77):
    """{key: shape} for an open_clip ViT CLIP export (OpenAI-compatible
    naming + the attn_mask buffer open_clip persists)."""
    mlp = mlp_dim or 4 * width
    t_mlp = 4 * t_width
    grid = res // patch
    s = {
        "logit_scale": (),
        "positional_embedding": (ctx, t_width),
        "text_projection": (t_width, embed),
        "token_embedding.weight": (vocab, t_width),
        "ln_final.weight": (t_width,), "ln_final.bias": (t_width,),
        "attn_mask": (ctx, ctx),  # persistent buffer in real exports
        "visual.class_embedding": (width,),
        "visual.positional_embedding": (grid * grid + 1, width),
        "visual.proj": (width, embed),
        "visual.conv1.weight": (width, 3, patch, patch),
        "visual.ln_pre.weight": (width,), "visual.ln_pre.bias": (width,),
        "visual.ln_post.weight": (width,), "visual.ln_post.bias": (width,),
    }
    for tower, n, w, m in (("visual.transformer", layers, width, mlp),
                           ("transformer", t_layers, t_width, t_mlp)):
        for i in range(n):
            p = f"{tower}.resblocks.{i}."
            s[p + "attn.in_proj_weight"] = (3 * w, w)
            s[p + "attn.in_proj_bias"] = (3 * w,)
            s[p + "attn.out_proj.weight"] = (w, w)
            s[p + "attn.out_proj.bias"] = (w,)
            s[p + "ln_1.weight"] = (w,)
            s[p + "ln_1.bias"] = (w,)
            s[p + "ln_2.weight"] = (w,)
            s[p + "ln_2.bias"] = (w,)
            s[p + "mlp.c_fc.weight"] = (m, w)
            s[p + "mlp.c_fc.bias"] = (m,)
            s[p + "mlp.c_proj.weight"] = (w, m)
            s[p + "mlp.c_proj.bias"] = (w,)
    return s


def openclip_convnext_shapes(width, depths, embed, t_width, t_layers,
                             proj="linear", vocab=49408, ctx=77):
    """{key: shape} for an open_clip ConvNeXt-CLIP export (timm trunk
    naming; proj_bias=False head, as every LAION export ships)."""
    dims = [width * 2 ** i for i in range(len(depths))]
    s = {
        "logit_scale": (),
        "positional_embedding": (ctx, t_width),
        "text_projection": (t_width, embed),
        "token_embedding.weight": (vocab, t_width),
        "ln_final.weight": (t_width,), "ln_final.bias": (t_width,),
        "visual.trunk.stem.0.weight": (width, 3, 4, 4),
        "visual.trunk.stem.0.bias": (width,),
        "visual.trunk.stem.1.weight": (width,),
        "visual.trunk.stem.1.bias": (width,),
        "visual.trunk.head.norm.weight": (dims[-1],),
        "visual.trunk.head.norm.bias": (dims[-1],),
    }
    for i in range(t_layers):
        p = f"transformer.resblocks.{i}."
        s[p + "attn.in_proj_weight"] = (3 * t_width, t_width)
        s[p + "attn.in_proj_bias"] = (3 * t_width,)
        s[p + "attn.out_proj.weight"] = (t_width, t_width)
        s[p + "attn.out_proj.bias"] = (t_width,)
        for ln in ("ln_1", "ln_2"):
            s[p + ln + ".weight"] = (t_width,)
            s[p + ln + ".bias"] = (t_width,)
        s[p + "mlp.c_fc.weight"] = (4 * t_width, t_width)
        s[p + "mlp.c_fc.bias"] = (4 * t_width,)
        s[p + "mlp.c_proj.weight"] = (t_width, 4 * t_width)
        s[p + "mlp.c_proj.bias"] = (t_width,)
    for st, depth in enumerate(depths):
        sp = f"visual.trunk.stages.{st}."
        if st:
            s[sp + "downsample.0.weight"] = (dims[st - 1],)
            s[sp + "downsample.0.bias"] = (dims[st - 1],)
            s[sp + "downsample.1.weight"] = (dims[st], dims[st - 1], 2, 2)
            s[sp + "downsample.1.bias"] = (dims[st],)
        for b in range(depth):
            bp = sp + f"blocks.{b}."
            d = dims[st]
            s[bp + "conv_dw.weight"] = (d, 1, 7, 7)
            s[bp + "conv_dw.bias"] = (d,)
            s[bp + "norm.weight"] = (d,)
            s[bp + "norm.bias"] = (d,)
            s[bp + "mlp.fc1.weight"] = (4 * d, d)
            s[bp + "mlp.fc1.bias"] = (4 * d,)
            s[bp + "mlp.fc2.weight"] = (d, 4 * d)
            s[bp + "mlp.fc2.bias"] = (d,)
            s[bp + "gamma"] = (d,)
    if proj == "linear":
        s["visual.head.proj.weight"] = (embed, dims[-1])
    else:
        s["visual.head.mlp.fc1.weight"] = (2 * embed, dims[-1])
        s["visual.head.mlp.fc1.bias"] = (2 * embed,)
        s["visual.head.mlp.fc2.weight"] = (embed, 2 * embed)
    return s


# ---------------------------------------------------------------------------
# full-scale shape-inference gates
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("arch,vit", [
    ("ViT-H/14", dict(width=1280, layers=32, patch=14, res=224, embed=1024,
                      t_width=1024, t_layers=24)),
    ("ViT-g/14", dict(width=1408, layers=40, patch=14, res=224, embed=1024,
                      t_width=1024, t_layers=24, mlp_dim=6144)),
    ("ViT-bigG/14", dict(width=1664, layers=48, patch=14, res=224,
                         embed=1280, t_width=1280, t_layers=32,
                         mlp_dim=8192)),
    ("ViT-L/14", dict(width=1024, layers=24, patch=14, res=224, embed=768,
                      t_width=768, t_layers=12)),
])
def test_vit_shape_inference_at_real_scale(arch, vit):
    """Config inferred from a real-scale open_clip state dict's shapes
    matches the registered arch EXACTLY — including the fields shapes
    alone cannot carry (head overrides, activation), recovered via the
    arch-table cross-check."""
    shapes = {k: v for k, v in openclip_vit_shapes(**vit).items()
              if not k.endswith("attn_mask")}
    cfg = config_from_state_dict_shapes(shapes)
    ref = CLIP_ARCHS[arch]
    for f in ("embed_dim", "image_resolution", "vision_layers",
              "vision_width", "vision_patch_size", "transformer_width",
              "transformer_layers", "vision_mlp_dim", "text_mlp_dim",
              "vision_heads_override", "act", "transformer_heads"):
        assert getattr(cfg, f) == getattr(ref, f), (arch, f)
    assert cfg.vision_heads == ref.vision_heads  # 16 for H/g/bigG


@pytest.mark.parametrize("tag,cn", [
    ("convnext_base_w", dict(width=128, depths=(3, 3, 27, 3), embed=640,
                             t_width=640, t_layers=12)),
    ("convnext_large_d_320", dict(width=192, depths=(3, 3, 27, 3),
                                  embed=768, t_width=768, t_layers=16,
                                  proj="mlp")),
    ("convnext_xxlarge", dict(width=384, depths=(3, 4, 30, 3), embed=1024,
                              t_width=1024, t_layers=24)),
])
def test_convnext_shape_inference_at_real_scale(tag, cn):
    from aihab_clip_tpu.models.convnext import convnext_config_for_name

    cfg = convnext_config_from_shapes(
        openclip_convnext_shapes(**cn))
    ref = convnext_config_for_name(tag)
    for f in ("embed_dim", "vision_layers", "vision_width",
              "transformer_width", "transformer_layers", "vision_proj",
              "act"):
        assert getattr(cfg, f) == getattr(ref, f), (tag, f)
    assert cfg.tower == "convnext"
    # resolution is intentionally NOT inferable (the converter warns and
    # callers pass it); the tag table is authoritative there
    assert ref.image_resolution in (224, 256, 320)


# ---------------------------------------------------------------------------
# value round-trip with real export quirks (tiny dims for speed)
# ---------------------------------------------------------------------------


def _materialize(shapes, seed=0):
    rng = np.random.default_rng(seed)
    return {k: (np.float32(2.659) if v == ()
                else rng.normal(size=v).astype(np.float32) * 0.02)
            for k, v in shapes.items()}


def test_vit_roundtrip_with_export_quirks():
    """attn_mask buffer + DDP module. prefix convert cleanly; converted
    tree == model.init tree; the model runs."""
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from aihab_clip_tpu.models import CLIPModel, torch_state_dict_to_params

    sd = _materialize(openclip_vit_shapes(
        width=64, layers=2, patch=8, res=32, embed=32, t_width=64,
        t_layers=2, vocab=512))
    wrapped = {"module." + k: v for k, v in sd.items()}
    cfg, params = torch_state_dict_to_params(wrapped)
    assert cfg.vision_width == 64 and cfg.embed_dim == 32

    model = CLIPModel(cfg)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                     jnp.zeros((1, 77), jnp.int32))["params"]
    flat_ref = traverse_util.flatten_dict(ref)
    flat_got = traverse_util.flatten_dict(params)
    assert set(flat_ref) == set(flat_got)
    for k in flat_ref:
        assert np.shape(flat_ref[k]) == np.shape(flat_got[k]), k

    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    pre, proj = model.apply({"params": params}, x,
                            method=CLIPModel.encode_image, project=True)
    assert proj.shape == (2, 32) and np.isfinite(np.asarray(proj)).all()


def test_convnext_roundtrip_with_module_prefix():
    from aihab_clip_tpu.models import torch_state_dict_to_params

    sd = _materialize(openclip_convnext_shapes(
        width=16, depths=(1, 1, 1, 1), embed=32, t_width=64, t_layers=2,
        vocab=512))
    wrapped = {"module." + k: v for k, v in sd.items()}
    cfg, params = torch_state_dict_to_params(wrapped, resolution=32)
    assert cfg.tower == "convnext"
    assert np.all(np.asarray(params["visual"]["head_proj"]["bias"]) == 0)
