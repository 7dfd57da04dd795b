"""SigLIP tower parity vs HuggingFace transformers SiglipModel (random tiny
weights, no downloads) + PEFT-mask compatibility + zoo integration."""

import numpy as np
import pytest

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")


def _tiny_hf_siglip():
    import torch

    cfg = transformers.SiglipConfig.from_text_vision_configs(
        transformers.SiglipTextConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, max_position_embeddings=16,
            vocab_size=512),
        transformers.SiglipVisionConfig(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8),
    )
    torch.manual_seed(0)
    return transformers.SiglipModel(cfg).eval()


@pytest.fixture(scope="module")
def hf_model():
    return _tiny_hf_siglip()


@pytest.fixture(scope="module")
def converted(hf_model):
    from aihab_clip_tpu.models.convert_hf import (
        hf_siglip_state_dict_to_params,
        siglip_config_from_hf,
    )
    from aihab_clip_tpu.models.siglip import SigLIPModel

    cfg = siglip_config_from_hf(hf_model.config)
    params = hf_siglip_state_dict_to_params(hf_model.state_dict(),
                                            cfg.vision_width)
    return SigLIPModel(cfg), params, cfg


def test_config_from_hf(hf_model, converted):
    _, _, cfg = converted
    assert cfg.vision_width == 64
    assert cfg.vision_mlp_dim == 128
    assert cfg.vision_layers == 2
    assert cfg.image_resolution == 32
    assert cfg.context_length == 16
    assert cfg.vocab_size == 512


def test_vision_parity(hf_model, converted, rng):
    import torch

    model, params, cfg = converted
    images = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf_model.vision_model(
            pixel_values=torch.from_numpy(images)).pooler_output.numpy()
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(np.transpose(images, (0, 2, 3, 1))),
        method=type(model).encode_image))
    np.testing.assert_allclose(ours, hf_out, atol=3e-5, rtol=1e-4)


def test_text_parity(hf_model, converted, rng):
    import torch

    model, params, cfg = converted
    tokens = rng.integers(0, 512, size=(2, 16)).astype(np.int64)
    with torch.no_grad():
        hf_out = hf_model.text_model(
            input_ids=torch.from_numpy(tokens)).pooler_output.numpy()
    _, ours = model.apply({"params": params},
                          jnp.asarray(tokens.astype(np.int32)),
                          method=type(model).encode_text)
    np.testing.assert_allclose(np.asarray(ours), hf_out, atol=3e-5, rtol=1e-4)


def test_full_logits_parity(hf_model, converted, rng):
    import torch

    model, params, cfg = converted
    images = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    tokens = rng.integers(0, 512, size=(3, 16)).astype(np.int64)
    with torch.no_grad():
        hf = hf_model(input_ids=torch.from_numpy(tokens),
                      pixel_values=torch.from_numpy(images))
        hf_logits = hf.logits_per_image.numpy()
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(np.transpose(images, (0, 2, 3, 1))),
        jnp.asarray(tokens.astype(np.int32))))
    np.testing.assert_allclose(ours, hf_logits, atol=5e-4, rtol=1e-3)


def test_peft_mask_compat(converted):
    from flax import traverse_util

    from aihab_clip_tpu.train.peft import build_lock_mask

    model, params, cfg = converted
    mask = build_lock_mask(params, cfg.vision_layers, cfg.text_layers,
                           unlocked_groups=1, tune_text=False)
    flat = traverse_util.flatten_dict(mask)
    trainable = {"/".join(k) for k, v in flat.items() if v}
    # head group = ln_post + MAP attnpool
    assert any(t.startswith("visual/attnpool") for t in trainable)
    assert any(t.startswith("visual/ln_post") for t in trainable)
    assert not any(t.startswith("visual/transformer") for t in trainable)
    assert not any(t.startswith("text/") for t in trainable)


def test_zoo_siglip_random_fallback():
    from aihab_clip_tpu.models import load

    b = load("random:SigLIP-Tiny")
    assert b.source == "random"
    assert b.config.vision_mlp_dim == 128
    out = b.model.apply({"params": b.params},
                        jnp.zeros((1, 32, 32, 3)),
                        method=type(b.model).encode_image)
    assert out.shape == (1, 64)


@pytest.mark.slow
def test_zoo_hf_hub_name_resolves_offline():
    """The reference's default backbone name resolves (random init only
    with the explicit opt-in when no local snapshot exists)."""
    import warnings as w

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.siglip import SIGLIP_ARCHS

    with w.catch_warnings():
        w.simplefilter("ignore")
        b = load("hf-hub:timm/ViT-B-16-SigLIP-224",
                 allow_random_fallback=True)
    assert b.config == SIGLIP_ARCHS["ViT-B-16-SigLIP-224"] or b.source == "hf-local"


def test_zoo_siglip_missing_assets_is_hard_error(tmp_path, monkeypatch):
    """A real SigLIP name without a local snapshot must raise early with
    the snapshot recipe — NOT silently random-init (the CLIP BPE vocab
    would produce wrong token ids for the text head)."""
    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.zoo import SigLIPAssetsMissingError

    monkeypatch.setenv("HF_HOME", str(tmp_path))  # empty hub
    with pytest.raises(SigLIPAssetsMissingError) as ei:
        load("hf-hub:timm/ViT-SO400M-16-SigLIP2-384")
    msg = str(ei.value)
    assert "hf download" in msg and "allow_random_fallback" in msg


def _fake_snapshot(tmp_path, repo="google/siglip2-tiny-test",
                   with_tokenizer=True):
    """Build a real tiny SiglipModel snapshot (+ fast tokenizer) in the HF
    hub cache layout, exactly as `hf download` would lay it out."""
    snap = (tmp_path / "hub" / f"models--{repo.replace('/', '--')}"
            / "snapshots" / "deadbeef")
    snap.mkdir(parents=True)
    _tiny_hf_siglip().save_pretrained(str(snap), safe_serialization=True)
    if with_tokenizer:
        from tokenizers import Tokenizer, models, pre_tokenizers

        words = ["a", "habitat", "photo", "of", "grassland", "woodland",
                 "heath", "bog", "specifically", "improved", "broadleaved"]
        vocab = {"<pad>": 0, "<unk>": 1, "</s>": 2}
        vocab.update({w: i + 3 for i, w in enumerate(words)})
        tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        fast = transformers.PreTrainedTokenizerFast(
            tokenizer_object=tok, pad_token="<pad>", unk_token="<unk>",
            eos_token="</s>")
        fast.save_pretrained(str(snap))
    return snap


def test_zoo_local_snapshot_end_to_end(tmp_path, monkeypatch, rng):
    """SO400M-style load path end-to-end given ONLY a local snapshot dir:
    find snapshot -> SiglipModel weights -> converted params -> snapshot
    tokenizer -> text head -> zero-shot logits vs the HF oracle."""
    import torch

    import jax

    from aihab_clip_tpu.models import build_text_head, load

    repo = "google/siglip2-tiny-test"
    snap = _fake_snapshot(tmp_path, repo)
    monkeypatch.setenv("HF_HOME", str(tmp_path))

    b = load(f"hf-hub:{repo}")
    assert b.source == "hf-local"
    assert b.tokenize_fn is not None

    # tokenizer round-trip: ids come from the snapshot tokenizer, padded
    # to context length
    prompts = ["a habitat photo of grassland", "a habitat photo of bog"]
    ids = b.tokenize_fn(prompts, b.config.context_length)
    assert ids.shape == (2, b.config.context_length)
    assert ids.dtype == np.int32
    ref_tok = transformers.AutoTokenizer.from_pretrained(str(snap))
    ref_ids = ref_tok(prompts, padding="max_length", truncation=True,
                      max_length=b.config.context_length,
                      return_tensors="np")["input_ids"]
    np.testing.assert_array_equal(ids, ref_ids.astype(np.int32))

    # zero-shot end-to-end: text head + image encode vs the HF oracle
    head = build_text_head(b.model, b.params, prompts, 2, 1,
                           context_length=b.config.context_length,
                           tokenize_fn=b.tokenize_fn)
    images = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    feats = b.model.apply({"params": b.params},
                          jnp.asarray(np.transpose(images, (0, 2, 3, 1))),
                          method=type(b.model).encode_image)
    feats = np.array(feats)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    ours = feats @ np.asarray(head["text_weights"])

    hf = _tiny_hf_siglip()  # same seed/arch as the snapshot
    with torch.no_grad():
        t_img = hf.get_image_features(pixel_values=torch.from_numpy(images))
        t_txt = hf.get_text_features(
            input_ids=torch.from_numpy(ref_ids.astype(np.int64)))
        t_img = torch.nn.functional.normalize(t_img, dim=-1)
        t_txt = torch.nn.functional.normalize(t_txt, dim=-1)
        oracle = (t_img @ t_txt.T).numpy()
    np.testing.assert_allclose(ours, oracle, atol=5e-4, rtol=1e-3)


def test_zoo_snapshot_without_tokenizer_is_hard_error(tmp_path, monkeypatch):
    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.zoo import SigLIPAssetsMissingError

    repo = "google/siglip2-tiny-test"
    _fake_snapshot(tmp_path, repo, with_tokenizer=False)
    monkeypatch.setenv("HF_HOME", str(tmp_path))
    with pytest.raises(SigLIPAssetsMissingError) as ei:
        load(f"hf-hub:{repo}")
    assert "tokenizer" in str(ei.value)
    # image-only workflows can opt out of the tokenizer requirement
    b = load(f"hf-hub:{repo}", require_tokenizer=False)
    assert b.source == "hf-local" and b.tokenize_fn is None


def test_runner_siglip_missing_assets_raises(tmp_path, monkeypatch):
    """Runner-level: the reference's default backbone without assets fails
    fast (no silent random fallback)."""
    from aihab_clip_tpu.config import ConfigNode
    from aihab_clip_tpu.models.zoo import SigLIPAssetsMissingError
    from aihab_clip_tpu.runner import init_clip_and_text_head

    monkeypatch.setenv("HF_HOME", str(tmp_path))
    cfg = ConfigNode({
        "clip_backend": "openclip",
        "open_clip_model": "hf-hub:timm/ViT-SO400M-16-SigLIP2-384",
    })
    with pytest.raises(SigLIPAssetsMissingError):
        init_clip_and_text_head(cfg)


@pytest.mark.slow
def test_runner_siglip_allow_random_weights_opt_in(tmp_path, monkeypatch):
    """`allow_random_weights: true` opts into the random bundle (builds
    the FULL 1.1B-param SO400M on CPU — slow tier)."""
    import warnings as w

    from aihab_clip_tpu.config import ConfigNode
    from aihab_clip_tpu.runner import init_clip_and_text_head

    monkeypatch.setenv("HF_HOME", str(tmp_path))
    cfg = ConfigNode({
        "clip_backend": "openclip",
        "open_clip_model": "hf-hub:timm/ViT-SO400M-16-SigLIP2-384",
        "allow_random_weights": True,
    })
    with w.catch_warnings():
        w.simplefilter("ignore")
        bundle = init_clip_and_text_head(cfg)
    assert bundle["source"] == "random"


def test_fast_siglip_encode_parity(rng):
    """The split-whole-block-attention SigLIP encode path matches the
    canonical Flax tower (interpret-mode Pallas)."""
    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.fast_siglip import (
        pack_siglip_fast_params,
        siglip_encode_fast,
    )

    b = load("random:SigLIP-Tiny", seed=3)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(b.model.apply({"params": b.params}, x,
                                   method=type(b.model).encode_image),
                     np.float32)
    packed = pack_siglip_fast_params(b.params, b.config, jnp.float32)
    out = np.asarray(siglip_encode_fast(b.params, x, b.config,
                                        dtype=jnp.float32, packed=packed,
                                        interpret=True),
                     np.float32)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=5e-4)

    pre, post = siglip_encode_fast(b.params, x, b.config, project=True,
                                   dtype=jnp.float32, interpret=True)
    assert pre.shape == post.shape == ref.shape


@pytest.mark.slow
def test_fast_siglip_sharded_matches_canonical(rng):
    """shard_map'd fast SigLIP encode over an 8-device data mesh ==
    canonical tower (interpret-mode Pallas per shard)."""
    import jax

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.fast_siglip import siglip_encode_fast
    from aihab_clip_tpu.models.fast_vit import encode_fn_sharded
    from aihab_clip_tpu.parallel import make_mesh

    b = load("random:SigLIP-Tiny", seed=3)
    mesh = make_mesh(jax.devices()[:8])
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(b.model.apply({"params": b.params}, x,
                                   method=type(b.model).encode_image),
                     np.float32)
    out = np.asarray(encode_fn_sharded(
        lambda p, xs: siglip_encode_fast(p, xs, b.config,
                                         dtype=jnp.float32, interpret=True),
        b.params, x, mesh), np.float32)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=5e-4)


# ---------------------------------------------------------------------------
# PEFT frozen-prefix hybrid (fused forward prefix + differentiable suffix)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_bundle():
    from aihab_clip_tpu.models import load

    return load("random:SigLIP-Tiny", seed=3)


def test_siglip_hybrid_forward_matches_canonical(tiny_bundle):
    from aihab_clip_tpu.models.fast_siglip import siglip_encode_hybrid

    b = tiny_bundle
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref = b.model.apply({"params": b.params}, x,
                        method=type(b.model).encode_image)
    for n_prefix in (0, 1, b.config.vision_layers):
        out = siglip_encode_hybrid(b.params, x, b.config, n_prefix,
                                   dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=5e-4)
    pooled, proj = siglip_encode_hybrid(b.params, x, b.config, 1,
                                        project=True, dtype=jnp.float32,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(pooled), np.asarray(proj))


@pytest.mark.slow
def test_siglip_hybrid_suffix_grads_match_canonical(tiny_bundle):
    """Grads w.r.t. the trainable suffix (last block + ln_post + MAP
    head) equal the canonical tower's; frozen-prefix grads are zero."""
    import jax

    from flax import traverse_util

    from aihab_clip_tpu.models.fast_siglip import siglip_encode_hybrid

    b = tiny_bundle
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    n_prefix = 1

    def loss_canonical(params):
        out = b.model.apply({"params": params}, x,
                            method=type(b.model).encode_image)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def loss_hybrid(params):
        out = siglip_encode_hybrid(params, x, b.config, n_prefix,
                                   dtype=jnp.float32, interpret=True)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    g_ref = traverse_util.flatten_dict(jax.grad(loss_canonical)(b.params))
    g_hyb = traverse_util.flatten_dict(jax.grad(loss_hybrid)(b.params))
    suffix = [k for k in g_ref if k[:3] == ("visual", "transformer",
                                            "resblocks_1")]
    suffix += [k for k in g_ref
               if k[:2] in {("visual", "ln_post"), ("visual", "attnpool")}]
    assert suffix
    for k in suffix:
        np.testing.assert_allclose(
            np.asarray(g_hyb[k]), np.asarray(g_ref[k]),
            atol=2e-3, rtol=2e-3, err_msg="/".join(map(str, k)))
    prefix = [k for k in g_ref
              if k[:3] == ("visual", "transformer", "resblocks_0")
              or (k[0] == "visual"
                  and k[1] in ("conv1", "positional_embedding"))]
    assert prefix
    for k in prefix:
        assert not np.any(np.asarray(g_hyb[k])), "/".join(map(str, k))


def test_siglip_hybrid_quant_prefix(tiny_bundle):
    """int8 frozen prefix through the SigLIP hybrid: forward within int8
    tolerance; prefix grads zero."""
    import jax

    from flax import traverse_util

    from aihab_clip_tpu.models.fast_siglip import siglip_encode_hybrid
    from aihab_clip_tpu.models.quant_siglip import quantize_siglip_block

    b = tiny_bundle
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    n_prefix = 1
    qprefix = {"resblocks_0": quantize_siglip_block(
        b.params["visual"]["transformer"]["resblocks_0"])}

    ref = np.asarray(b.model.apply({"params": b.params}, x,
                                   method=type(b.model).encode_image))
    out = np.asarray(siglip_encode_hybrid(
        b.params, x, b.config, n_prefix, dtype=jnp.float32, interpret=True,
        qprefix=qprefix))
    cos = np.sum(ref * out, -1) / (np.linalg.norm(ref, axis=-1)
                                   * np.linalg.norm(out, axis=-1))
    assert np.all(cos > 0.99), cos

    def loss_hybrid(params):
        out = siglip_encode_hybrid(params, x, b.config, n_prefix,
                                   dtype=jnp.float32, interpret=True,
                                   qprefix=qprefix)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    g = traverse_util.flatten_dict(jax.grad(loss_hybrid)(b.params))
    prefix = [k for k in g
              if k[:3] == ("visual", "transformer", "resblocks_0")]
    assert prefix
    for k in prefix:
        assert not np.any(np.asarray(g[k])), "/".join(map(str, k))
    suffix = [k for k in g
              if k[:3] == ("visual", "transformer", "resblocks_1")]
    assert suffix and any(np.any(np.asarray(g[k])) for k in suffix)


def test_siglip_encode_scan_matches_module():
    """scan-over-blocks canonical encode == unrolled module tower."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.fast_siglip import siglip_encode_scan

    bundle = load("random:SigLIP-Tiny", seed=0)
    cfg = bundle.config
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (3, cfg.image_resolution, cfg.image_resolution, 3)), jnp.float32)
    ref = bundle.model.apply(
        {"params": bundle.params}, x,
        method=type(bundle.model).encode_image)
    got = siglip_encode_scan(bundle.params, x, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_siglip_scan_grad_matches_unrolled():
    """d(loss)/d(block params) through lax.scan == through the unrolled
    loop (stacked grads vs per-block grads)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.fast_siglip import (
        _canonical_siglip_block, canonical_blocks_scan, stack_block_params)

    bundle = load("random:SigLIP-Tiny", seed=0)
    cfg = bundle.config
    vp = bundle.params["visual"]
    rng = np.random.default_rng(1)
    s = (cfg.image_resolution // cfg.patch_size) ** 2
    x = jnp.asarray(rng.standard_normal((2, s, cfg.vision_width)),
                    jnp.float32)

    stacked = stack_block_params(vp, 0, cfg.vision_layers)

    def loss_scan(stk):
        h = canonical_blocks_scan(x, stk, cfg.vision_heads, jnp.float32)
        return jnp.sum(jnp.square(h))

    def loss_unrolled(blocks):
        h = x
        for i in range(cfg.vision_layers):
            h = _canonical_siglip_block(h, blocks[f"resblocks_{i}"],
                                        cfg.vision_heads, jnp.float32)
        return jnp.sum(jnp.square(h))

    g_scan = jax.grad(loss_scan)(stacked)
    g_unr = jax.grad(loss_unrolled)(
        {f"resblocks_{i}": vp["transformer"][f"resblocks_{i}"]
         for i in range(cfg.vision_layers)})
    for i in range(cfg.vision_layers):
        gs = jax.tree.map(lambda t: np.asarray(t[i]), g_scan)
        gu = jax.tree.map(np.asarray, g_unr[f"resblocks_{i}"])
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            a, b, atol=1e-4, rtol=1e-4), gs, gu)


def test_siglip_scan_remat_grad_matches_plain():
    """The remat'd scan body (the XLA grad-of-scan crash workaround,
    `tools_dev/repro_scan_crash.py`) is gradient-identical to the plain
    scan — remat changes the backward's SCHEDULE, never its math."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.fast_siglip import (
        canonical_blocks_scan, stack_block_params)

    bundle = load("random:SigLIP-Tiny", seed=0)
    cfg = bundle.config
    rng = np.random.default_rng(2)
    s = (cfg.image_resolution // cfg.patch_size) ** 2
    x = jnp.asarray(rng.standard_normal((2, s, cfg.vision_width)),
                    jnp.float32)
    stacked = stack_block_params(bundle.params["visual"], 0,
                                 cfg.vision_layers)

    def loss(stk, remat):
        h = canonical_blocks_scan(x, stk, cfg.vision_heads, jnp.float32,
                                  remat=remat)
        return jnp.sum(jnp.square(h))

    g_plain = jax.grad(lambda s_: loss(s_, False))(stacked)
    g_remat = jax.grad(lambda s_: loss(s_, True))(stacked)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
        g_plain, g_remat)


def test_siglip_text_scan_matches_module():
    """scan-over-blocks text encode == unrolled text tower (pre and
    projected)."""
    import jax.numpy as jnp
    import numpy as np

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.fast_siglip import siglip_text_scan

    bundle = load("random:SigLIP-Tiny", seed=0)
    cfg = bundle.config
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(
        0, cfg.vocab_size, (5, cfg.context_length)), jnp.int32)
    ref_pre, ref_proj = bundle.model.apply(
        {"params": bundle.params}, tokens,
        method=type(bundle.model).encode_text)
    pre, proj = siglip_text_scan(bundle.params, tokens, cfg,
                                 dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(ref_pre),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(ref_proj),
                               atol=2e-5, rtol=2e-5)


def test_siglip_hybrid_packed_prefix_matches_inplace(tiny_bundle):
    """Pre-packed prefix weights (the per-run hoist the PEFT step uses)
    produce the same hybrid encode as packing inside the call."""
    import jax.numpy as jnp
    import numpy as np

    from aihab_clip_tpu.models.fast_siglip import (
        pack_siglip_fast_params, siglip_encode_hybrid)

    bundle = tiny_bundle
    cfg = bundle.config
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(
        (2, cfg.image_resolution, cfg.image_resolution, 3)), jnp.float32)
    packed = pack_siglip_fast_params(bundle.params, cfg, jnp.float32,
                                     stop=1)
    a = siglip_encode_hybrid(bundle.params, x, cfg, 1, dtype=jnp.float32,
                             interpret=True)
    b = siglip_encode_hybrid(bundle.params, x, cfg, 1, dtype=jnp.float32,
                             interpret=True, packed_prefix=packed)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
