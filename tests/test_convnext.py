"""ConvNeXt-CLIP family: tower contract, tag parsing, open_clip checkpoint
conversion, lock-mask grouping, and the PEFT pipeline end-to-end.

The reference reaches this family by forwarding the tag to open_clip
(`/root/reference/aihab_utils/model_init.py:42-60`); with zero egress and
no local timm/open_clip, parity here is structural — converter output must
be tree/shape-identical to the Flax model's own init, and the tag grid's
dimensions are asserted against the public open_clip config facts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aihab_clip_tpu.models import load
from aihab_clip_tpu.models.convnext import (
    convnext_config_for_name,
    openclip_convnext_state_dict_to_params,
)


@pytest.fixture(scope="module")
def tiny():
    return load("random:TinyConvNeXt")


def test_tower_contract(tiny):
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    pre = tiny.model.apply({"params": tiny.params}, x,
                           method=type(tiny.model).encode_image)
    assert pre.shape == (2, tiny.config.vision_preproj_dim) == (2, 128)
    pre2, proj = tiny.model.apply({"params": tiny.params}, x,
                                  method=type(tiny.model).encode_image,
                                  project=True)
    np.testing.assert_allclose(pre, pre2, atol=1e-6)
    assert proj.shape == (2, tiny.config.embed_dim)
    assert np.isfinite(np.asarray(proj)).all()
    # text tower unchanged (standard CLIP BPE tower)
    toks = jnp.zeros((2, 77), jnp.int32)
    tpre, tproj = tiny.model.apply({"params": tiny.params}, toks,
                                   method=type(tiny.model).encode_text)
    assert tproj.shape == (2, tiny.config.embed_dim)


def test_tag_parser_grid():
    cases = {
        "convnext_base_w": (640, 256, 128, "linear"),
        "convnext_base_w_320": (640, 320, 128, "linear"),
        "convnext_large_d": (768, 256, 192, "mlp"),
        "hf-hub:laion/CLIP-convnext_large_d_320.laion2B-s29B-b131K-ft-soup":
            (768, 320, 192, "mlp"),
        "laion/CLIP-convnext_xxlarge-laion2B-s34B-b82K-augreg":
            (1024, 256, 384, "linear"),
        "ConvNeXt-Base-W": (640, 256, 128, "linear"),  # dashed form
    }
    for name, (embed, res, width, proj) in cases.items():
        cfg = convnext_config_for_name(name)
        assert cfg.embed_dim == embed and cfg.image_resolution == res
        assert cfg.vision_width == width and cfg.vision_proj == proj
        assert cfg.tower == "convnext" and cfg.act == "gelu"
    assert convnext_config_for_name("ViT-B/16") is None
    with pytest.raises(ValueError, match="Unrecognized ConvNeXt"):
        convnext_config_for_name("convnext_nano")
    # xxlarge has the deeper stage-2 (timm convnext_xxlarge depths)
    assert convnext_config_for_name("convnext_xxlarge").vision_layers == \
        (3, 4, 30, 3)


def _synthetic_openclip_sd(depths=(1, 1, 1, 1), width=16, embed=32,
                           t_width=64, t_layers=2, proj="linear", seed=0):
    """A torch-layout open_clip ConvNeXt-CLIP state dict (numpy values)."""
    rng = np.random.default_rng(seed)
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.02  # noqa: E731
    sd = {
        "logit_scale": np.float32(2.659),
        "positional_embedding": r(77, t_width),
        "text_projection": r(t_width, embed),
        "token_embedding.weight": r(512, t_width),  # small vocab for speed
        "ln_final.weight": r(t_width) + 1, "ln_final.bias": r(t_width),
        "visual.trunk.stem.0.weight": r(width, 3, 4, 4),
        "visual.trunk.stem.0.bias": r(width),
        "visual.trunk.stem.1.weight": r(width) + 1,
        "visual.trunk.stem.1.bias": r(width),
    }
    for li in range(t_layers):
        p = f"transformer.resblocks.{li}."
        sd[p + "attn.in_proj_weight"] = r(3 * t_width, t_width)
        sd[p + "attn.in_proj_bias"] = r(3 * t_width)
        sd[p + "attn.out_proj.weight"] = r(t_width, t_width)
        sd[p + "attn.out_proj.bias"] = r(t_width)
        sd[p + "ln_1.weight"] = r(t_width) + 1
        sd[p + "ln_1.bias"] = r(t_width)
        sd[p + "ln_2.weight"] = r(t_width) + 1
        sd[p + "ln_2.bias"] = r(t_width)
        sd[p + "mlp.c_fc.weight"] = r(4 * t_width, t_width)
        sd[p + "mlp.c_fc.bias"] = r(4 * t_width)
        sd[p + "mlp.c_proj.weight"] = r(t_width, 4 * t_width)
        sd[p + "mlp.c_proj.bias"] = r(t_width)
    dims = [width * 2 ** i for i in range(len(depths))]
    for s, depth in enumerate(depths):
        sp = f"visual.trunk.stages.{s}."
        if s:
            sd[sp + "downsample.0.weight"] = r(dims[s - 1]) + 1
            sd[sp + "downsample.0.bias"] = r(dims[s - 1])
            sd[sp + "downsample.1.weight"] = r(dims[s], dims[s - 1], 2, 2)
            sd[sp + "downsample.1.bias"] = r(dims[s])
        for b in range(depth):
            bp = sp + f"blocks.{b}."
            d = dims[s]
            sd[bp + "conv_dw.weight"] = r(d, 1, 7, 7)
            sd[bp + "conv_dw.bias"] = r(d)
            sd[bp + "norm.weight"] = r(d) + 1
            sd[bp + "norm.bias"] = r(d)
            sd[bp + "mlp.fc1.weight"] = r(4 * d, d)
            sd[bp + "mlp.fc1.bias"] = r(4 * d)
            sd[bp + "mlp.fc2.weight"] = r(d, 4 * d)
            sd[bp + "mlp.fc2.bias"] = r(d)
            sd[bp + "gamma"] = r(d) + 1e-6
    sd["visual.trunk.head.norm.weight"] = r(dims[-1]) + 1
    sd["visual.trunk.head.norm.bias"] = r(dims[-1])
    # Real open_clip exports use proj_bias=False: no bias on head.proj /
    # head.mlp.fc2 (fc1 keeps its bias — Mlp(..., bias=(True, proj_bias))).
    if proj == "linear":
        sd["visual.head.proj.weight"] = r(embed, dims[-1])
    else:
        sd["visual.head.mlp.fc1.weight"] = r(2 * embed, dims[-1])
        sd["visual.head.mlp.fc1.bias"] = r(2 * embed)
        sd["visual.head.mlp.fc2.weight"] = r(embed, 2 * embed)
    return sd


@pytest.mark.parametrize("proj", ["linear", "mlp"])
def test_converter_matches_model_tree(proj):
    """Converted tree is structure- and shape-identical to model.init's,
    the inferred config matches, and the converted model runs."""
    import dataclasses

    from flax import traverse_util

    from aihab_clip_tpu.models import CLIPModel

    sd = _synthetic_openclip_sd(proj=proj)
    cfg, params = openclip_convnext_state_dict_to_params(sd, resolution=32)
    assert cfg.tower == "convnext" and cfg.vision_proj == proj
    assert cfg.vision_layers == (1, 1, 1, 1) and cfg.vision_width == 16
    assert cfg.embed_dim == 32 and cfg.transformer_layers == 2
    assert cfg.vocab_size == 512

    model = CLIPModel(cfg)
    ref = model.init(jax.random.key(0),
                     jnp.zeros((1, 32, 32, 3)),
                     jnp.zeros((1, 77), jnp.int32))["params"]
    flat_ref = traverse_util.flatten_dict(ref)
    flat_got = traverse_util.flatten_dict(params)
    assert set(flat_ref) == set(flat_got)
    for k in flat_ref:
        assert np.shape(flat_ref[k]) == np.shape(flat_got[k]), k

    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 32, 32, 3)).astype(np.float32))
    pre, y = model.apply({"params": params}, x,
                         method=CLIPModel.encode_image, project=True)
    assert y.shape == (2, 32) and np.isfinite(np.asarray(y)).all()
    del dataclasses


def test_torch_converter_dispatches_convnext():
    from aihab_clip_tpu.models import torch_state_dict_to_params

    cfg, params = torch_state_dict_to_params(_synthetic_openclip_sd())
    assert cfg.tower == "convnext"
    assert "stem_conv" in params["visual"]
    # proj_bias=False checkpoints get their head bias zero-filled
    assert np.all(np.asarray(params["visual"]["head_proj"]["bias"]) == 0)


def test_load_checkpoint_path_without_tag(tmp_path):
    """A checkpoint file whose path embeds no known tag loads through
    shape inference instead of hard-erroring on tag parsing (ADVICE r2)."""
    import torch

    ckpt = tmp_path / "my_convnext_ft.pt"
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in _synthetic_openclip_sd().items()}, str(ckpt))
    with pytest.warns(UserWarning, match="resolution is not inferable"):
        bundle = load(str(ckpt), cache_dir=tmp_path / "zoo")
    assert bundle.config.tower == "convnext"
    assert bundle.config.vision_width == 16
    x = jnp.zeros((1, bundle.config.image_resolution,
                   bundle.config.image_resolution, 3))
    pre = bundle.model.apply({"params": bundle.params}, x,
                             method=type(bundle.model).encode_image)
    assert np.isfinite(np.asarray(pre)).all()


def test_lock_mask_groups(tiny):
    from flax import traverse_util

    from aihab_clip_tpu.train.peft import build_lock_mask

    depths = tiny.config.vision_layers  # (1, 1, 1, 1) -> 6 groups
    mk = lambda n: traverse_util.flatten_dict(build_lock_mask(  # noqa: E731
        tiny.params, vision_layers=depths,
        text_layers=tiny.config.transformer_layers,
        unlocked_groups=n, is_vit=False, tower="convnext"))

    m1 = mk(1)  # head only
    assert all(v == (p[1].startswith("head_"))
               for p, v in m1.items() if p[0] == "visual")
    m2 = mk(2)  # + last block (and any downsample feeding it)
    trainables = {p[1] for p, v in m2.items() if p[0] == "visual" and v}
    assert trainables == {"head_norm", "head_proj", "stage3_block0",
                          "down_norm_3", "down_conv_3"}
    m_all = mk(len(depths) + 2)
    assert all(v for p, v in m_all.items() if p[0] == "visual")
    # text stays frozen without tune_text
    assert not any(v for p, v in m_all.items() if p[0] == "text")


def test_prolip_projector_spec(tiny):
    from aihab_clip_tpu.train.prolip import ProjectorSpec

    spec = ProjectorSpec.from_clip_params(tiny.params, tiny.config.is_vit)
    assert spec.weight.shape == (128, 32) and spec.bias is not None

    # MLP-head variants refuse projector-only tuning (no linear map over
    # the cached pre-projection feature exists)
    cfg, params = openclip_convnext_state_dict_to_params(
        _synthetic_openclip_sd(proj="mlp"), resolution=32)
    with pytest.raises(ValueError, match="MLP-head ConvNeXt"):
        ProjectorSpec.from_clip_params(params, cfg.is_vit)


def test_peft_pipeline_convnext(tmp_path):
    """Runner-level PEFT fine-tune on synthetic data with the ConvNeXt
    tower (openclip backend), including eval metrics."""
    from aihab_clip_tpu.config import ConfigNode
    from aihab_clip_tpu.data import make_synthetic_cs_dataset
    from aihab_clip_tpu.runner import run

    synth = make_synthetic_cs_dataset(tmp_path, n_train_per_class=4,
                                      n_test_per_class=2, image_size=48)
    cfg = ConfigNode({
        "root_path": str(tmp_path), "dataset": "synth", "seed": 1,
        "shots": 0, "subset_l3": [], "clip_backend": "openclip",
        "open_clip_model": "random:TinyConvNeXt", "wandb_project": None,
        "use_hierarchical_prompts": False,
        "use_descriptive_prompts": False, "remat": False,
        "train_epoch": 1, "lr_v": 0.002, "save_features": False,
        "finetune": {
            "enabled": True, "tune_text": False, "unlocked_groups": 2,
            "unlocked_layers": 1, "val_interval": 0, "eval_l2": False,
            "require_cached_features": False, "save_model": False,
            "cache_embeddings": False,
        },
        "data": {
            "dataset_paths": synth["dataset_paths"],
            "index_file_names": synth["index_file_names"],
            "batch_size": 8, "shuffle": True, "num_workers": 0,
            "data_split": {"valid_split": 0.25, "split_seed": 42},
            "use_l2_label": False,
            "preprocessing": {
                "resize": 48, "resolution": 32,
                "augmentations": {"bottom_crop": False, "random_crop": True,
                                  "flip": False, "rotation": False},
            },
        },
    })
    result = run(cfg, inspect_only=False)
    t = result["peft"]["test"]
    assert t is not None and 0.0 <= t["top1"] <= 1.0
    assert np.isfinite(t["loss"])


# ---------------------------------------------------------------------------
# fused encode path (interpret-mode parity; the TPU dispatch reuses it)
# ---------------------------------------------------------------------------

class TestFusedEncode:
    @pytest.mark.parametrize("impl", ["cheb", "rational"])
    def test_erf_poly_accuracy(self, impl):
        from aihab_clip_tpu.ops import block_kernel as bk

        import scipy.special as sp

        fn = {"cheb": bk._erf_f32_cheb, "rational": bk._erf_f32_rational}[impl]
        x = jnp.asarray(np.linspace(-12, 12, 8001), jnp.float32)
        got = np.asarray(fn(x))
        want = sp.erf(np.asarray(x, np.float64))
        # cheb (deg-14 Chebyshev, no transcendentals) evals to ~3.6e-7 in
        # f32; A&S 7.1.26 rounds to ~4.6e-7
        assert np.abs(got - want).max() <= 1e-6

    @pytest.mark.parametrize("impl,tol", [
        ("sig", 1e-5),        # sigmoid-of-odd-poly default: 3.4e-6 f32
        ("sig5", 1e-4),       # deg-5 form: 5.3e-5 f32 (r5, 2 fewer slots)
        ("cheb", 1e-6),
        ("rational", 1e-6),
    ])
    def test_gelu_poly_matches_exact(self, impl, tol, monkeypatch):
        from aihab_clip_tpu.ops.block_kernel import _act_f32

        monkeypatch.setenv("AIHAB_ERF_IMPL", impl)
        # wide range: the sig form must stay exact past its +-7.5 clamp
        h = jnp.asarray(np.linspace(-30, 30, 8001), jnp.float32)
        got = np.asarray(_act_f32(h, "gelu_poly"))
        want = np.asarray(jax.nn.gelu(
            jnp.asarray(np.asarray(h, np.float64)), approximate=False))
        assert np.abs(got - want).max() <= tol

    def test_mlp_block_kernel_parity(self, rng):
        from aihab_clip_tpu.ops.block_kernel import convnext_mlp_block

        m, c = 96, 64
        y = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
        res = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
        ln_s = jnp.asarray(rng.normal(size=c).astype(np.float32)) * 0.1 + 1
        ln_b = jnp.asarray(rng.normal(size=c).astype(np.float32)) * 0.1
        w1 = jnp.asarray(rng.normal(size=(c, 4 * c)).astype(np.float32)) * 0.05
        b1 = jnp.asarray(rng.normal(size=4 * c).astype(np.float32)) * 0.05
        w2 = jnp.asarray(rng.normal(size=(4 * c, c)).astype(np.float32)) * 0.05
        b2 = jnp.asarray(rng.normal(size=c).astype(np.float32)) * 0.05
        g = jnp.asarray(rng.normal(size=c).astype(np.float32)) * 0.2

        def canonical():
            xf = y.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = jnp.square(xf - mean).mean(-1, keepdims=True)
            ln = (xf - mean) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
            h = jax.nn.gelu(ln @ w1 + b1, approximate=False)
            return res + (h @ w2 + b2) * g

        want = np.asarray(canonical())
        got = np.asarray(convnext_mlp_block(
            y, res, ln_s, ln_b, w1, b1, w2, b2, g, interpret=True))
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
        # chunked variant (wide-stage recipe) must match bit-for-tolerance
        got2 = np.asarray(convnext_mlp_block(
            y, res, ln_s, ln_b, w1, b1, w2, b2, g, interpret=True,
            n_chunks=2))
        np.testing.assert_allclose(got2, want, atol=5e-5, rtol=1e-4)

    def test_fused_encode_matches_canonical(self, tiny, rng):
        from aihab_clip_tpu.models.fast_convnext import convnext_encode_fused

        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        pre_ref, proj_ref = tiny.model.apply(
            {"params": tiny.params}, x, method=type(tiny.model).encode_image,
            project=True)
        pre, proj = convnext_encode_fused(tiny.params, x, tiny.config,
                                          project=True, interpret=True)
        np.testing.assert_allclose(np.asarray(pre), np.asarray(pre_ref),
                                   atol=2e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(proj), np.asarray(proj_ref),
                                   atol=2e-5, rtol=1e-4)

    def test_fused_encode_dwmat_matches_canonical(self, tiny, rng):
        """Banded-matmul depthwise path (dwmat=) == canonical module —
        the A matrices encode the 7x7 SAME-pad conv exactly."""
        from aihab_clip_tpu.models.fast_convnext import (
            build_dw_matrices,
            convnext_encode_fused,
        )

        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        pre_ref, proj_ref = tiny.model.apply(
            {"params": tiny.params}, x, method=type(tiny.model).encode_image,
            project=True)
        dwmat = build_dw_matrices(tiny.params, tiny.config,
                                  dtype=jnp.float32)
        assert dwmat is not None and len(dwmat) == 4  # all tiny stages fit
        pre, proj = convnext_encode_fused(tiny.params, x, tiny.config,
                                          project=True, dwmat=dwmat,
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(pre), np.asarray(pre_ref),
                                   atol=5e-5, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(proj), np.asarray(proj_ref),
                                   atol=5e-5, rtol=2e-4)

    def test_dwmat_budget_excludes_large_maps(self, tiny):
        """Blocks over the per-layer byte cap keep the conv path (no
        silent multi-GB A tensors at the _320 resolutions)."""
        from aihab_clip_tpu.models.fast_convnext import build_dw_matrices

        dwmat = build_dw_matrices(tiny.params, tiny.config,
                                  dtype=jnp.float32, max_bytes=0)
        assert dwmat is None

    def test_fused_encode_sharded_matches_canonical(self, tiny, rng):
        """The DP-mesh dispatch: same fused kernels per shard via
        shard_map (GSPMD cannot partition a pallas_call)."""
        import jax

        from aihab_clip_tpu.models.fast_convnext import convnext_encode_fused
        from aihab_clip_tpu.models.fast_vit import encode_fn_sharded
        from aihab_clip_tpu.parallel import make_mesh

        mesh = make_mesh(jax.devices()[:8])
        x = jnp.asarray(rng.standard_normal((8, 32, 32, 3))
                        .astype(np.float32))
        ref_pre, ref_post = tiny.model.apply(
            {"params": tiny.params}, x, method=type(tiny.model).encode_image,
            project=True)

        def local(p, xs):
            return convnext_encode_fused(p, xs, tiny.config, project=True,
                                         interpret=True)

        pre, post = encode_fn_sharded(local, tiny.params, x, mesh,
                                      pair_output=True)
        np.testing.assert_allclose(np.asarray(pre), np.asarray(ref_pre),
                                   atol=5e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(post), np.asarray(ref_post),
                                   atol=5e-5, rtol=1e-4)

    @pytest.mark.slow
    def test_hybrid_forward_matches_canonical(self, tiny, rng):
        """Fused frozen prefix + differentiable jnp suffix == canonical
        module (interpret-mode kernels), at several prefix depths."""
        from aihab_clip_tpu.models.fast_convnext import convnext_encode_hybrid

        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3))
                        .astype(np.float32))
        ref_pre, ref_post = tiny.model.apply(
            {"params": tiny.params}, x, method=type(tiny.model).encode_image,
            project=True)
        total = sum(tiny.config.vision_layers)
        for n_prefix in (0, 1, total // 2, total):
            pre, post = convnext_encode_hybrid(
                tiny.params, x, tiny.config, n_prefix, project=True,
                interpret=True)
            np.testing.assert_allclose(
                np.asarray(pre), np.asarray(ref_pre), atol=5e-5, rtol=1e-4,
                err_msg=f"n_prefix={n_prefix}")
            np.testing.assert_allclose(
                np.asarray(post), np.asarray(ref_post), atol=5e-5,
                rtol=1e-4, err_msg=f"n_prefix={n_prefix}")

    @pytest.mark.slow
    def test_hybrid_suffix_grads_match_canonical(self, tiny, rng):
        """Suffix gradients through the hybrid == canonical module grads
        (the frozen prefix receives none by construction)."""
        from flax import traverse_util

        from aihab_clip_tpu.models.fast_convnext import convnext_encode_hybrid

        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3))
                        .astype(np.float32))
        n_prefix = 2

        def loss_hybrid(p):
            _, post = convnext_encode_hybrid(p, x, tiny.config, n_prefix,
                                             project=True, interpret=True)
            return jnp.sum(post.astype(jnp.float32) ** 2)

        def loss_canonical(p):
            _, post = tiny.model.apply(
                {"params": p}, x, method=type(tiny.model).encode_image,
                project=True)
            return jnp.sum(post.astype(jnp.float32) ** 2)

        g_h = traverse_util.flatten_dict(jax.grad(loss_hybrid)(tiny.params))
        g_c = traverse_util.flatten_dict(
            jax.grad(loss_canonical)(tiny.params))
        # frozen-prefix leaves get exactly zero through the hybrid
        zeroed = [k for k, v in g_h.items()
                  if k[0] == "visual" and not np.any(np.asarray(v))]
        assert any("stem_conv" in "/".join(k) for k in zeroed)
        # trainable-suffix + head grads match the canonical formulation
        for k, v in g_h.items():
            path = "/".join(k)
            if np.any(np.asarray(v)):
                np.testing.assert_allclose(
                    np.asarray(v), np.asarray(g_c[k]), atol=2e-2, rtol=2e-3,
                    err_msg=path)

    def test_int8_mlp_kernel_parity(self, rng):
        """W8A8 ConvNeXt MLP kernel vs the f32 math with identically
        quantized weights (activation-quantization noise bounded)."""
        from aihab_clip_tpu.ops.quant import quantize_weight
        from aihab_clip_tpu.ops.quant_matmul import quant_convnext_mlp_block

        m, c = 96, 64
        y = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
        res = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
        ln_s = jnp.asarray(rng.normal(size=c).astype(np.float32)) * .1 + 1
        ln_b = jnp.asarray(rng.normal(size=c).astype(np.float32)) * .1
        w1 = jnp.asarray(rng.normal(size=(c, 4 * c)).astype(np.float32)) * .05
        b1 = jnp.asarray(rng.normal(size=4 * c).astype(np.float32)) * .05
        w2 = jnp.asarray(rng.normal(size=(4 * c, c)).astype(np.float32)) * .05
        b2 = jnp.asarray(rng.normal(size=c).astype(np.float32)) * .05
        g = jnp.asarray(rng.normal(size=c).astype(np.float32)) * .2
        w1_8, s1 = quantize_weight(w1)
        w2_8, s2 = quantize_weight(w2)

        got = np.asarray(quant_convnext_mlp_block(
            y, res, ln_s, ln_b, w1_8, s1, b1, w2_8, s2, b2, g,
            interpret=True))

        xf = np.asarray(y, np.float64)
        mean = xf.mean(-1, keepdims=True)
        var = ((xf - mean) ** 2).mean(-1, keepdims=True)
        ln = (xf - mean) / np.sqrt(var + 1e-6) * np.asarray(ln_s) \
            + np.asarray(ln_b)
        h = ln @ np.asarray(w1_8, np.float64) * np.asarray(s1)
        import scipy.special as sp

        h = h + np.asarray(b1)
        h = 0.5 * h * (1.0 + sp.erf(h / np.sqrt(2.0)))
        out = h @ np.asarray(w2_8, np.float64) * np.asarray(s2)
        want = np.asarray(res) + (out + np.asarray(b2)) * np.asarray(g)
        # activation quantization (per-row 127-level) bounds the error
        denom = np.abs(want).max()
        assert np.abs(got - want).max() / denom < 0.05
        cos = (got * want).sum() / (np.linalg.norm(got)
                                    * np.linalg.norm(want))
        assert cos > 0.999

    def test_int8_encode_cosine_vs_bf16(self, tiny, rng):
        """Whole-tower int8 features stay aligned with the fused bf16
        path (the serving-density accuracy bound)."""
        from aihab_clip_tpu.models.fast_convnext import (
            convnext_encode_fused,
            quantize_convnext_mlp,
        )

        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3))
                        .astype(np.float32))
        _, ref = convnext_encode_fused(tiny.params, x, tiny.config,
                                       project=True, interpret=True)
        qmlp = quantize_convnext_mlp(tiny.params, tiny.config)
        _, q = convnext_encode_fused(tiny.params, x, tiny.config,
                                     project=True, qmlp=qmlp,
                                     interpret=True)
        ref, q = np.asarray(ref, np.float64), np.asarray(q, np.float64)
        cos = (ref * q).sum(-1) / (np.linalg.norm(ref, axis=-1)
                                   * np.linalg.norm(q, axis=-1))
        assert cos.min() > 0.99, cos
