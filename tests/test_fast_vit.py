"""Fast (fused-kernel) ViT encode path == canonical Flax CLIPModel."""

import numpy as np
import pytest

import jax.numpy as jnp

from aihab_clip_tpu.models import CLIPConfig, CLIPModel, load
from aihab_clip_tpu.models.fast_vit import vit_encode_fast

TINY = CLIPConfig(
    embed_dim=32, image_resolution=32, vision_layers=3, vision_width=128,
    vision_patch_size=8, context_length=77, vocab_size=49408,
    transformer_width=64, transformer_heads=1, transformer_layers=2)


@pytest.fixture(scope="module")
def bundle():
    return load("random:tiny-fast", random_cfg=TINY, seed=5)


def test_fast_matches_canonical(bundle, rng):
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 3)).astype(np.float32))
    ref = bundle.model.apply({"params": bundle.params}, x,
                             method=CLIPModel.encode_image)
    out = vit_encode_fast(bundle.params, x, TINY, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_fast_projected_matches(bundle, rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref_pre, ref_post = bundle.model.apply(
        {"params": bundle.params}, x, method=CLIPModel.encode_image,
        project=True)
    pre, post = vit_encode_fast(bundle.params, x, TINY, project=True,
                                dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(ref_pre),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(post), np.asarray(ref_post),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.slow
def test_fast_vitb_shapes():
    """ViT-B/16 single tiny batch through the fast path (CPU, fp32)."""
    b = load("random:ViT-B/16", seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 224, 224, 3)).astype(np.float32))
    out = vit_encode_fast(b.params, x, b.config, dtype=jnp.float32)
    assert out.shape == (1, 768)
    ref = b.model.apply({"params": b.params}, x, method=CLIPModel.encode_image)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_block_fused_sharded_matches_canonical(bundle, rng):
    """shard_map'd whole-block encode over an 8-device data mesh ==
    canonical tower (interpret-mode Pallas per shard)."""
    import jax

    from aihab_clip_tpu.models.fast_vit import vit_encode_block_fused_sharded
    from aihab_clip_tpu.parallel import make_mesh

    mesh = make_mesh(jax.devices()[:8])
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))
    ref_pre, ref_post = bundle.model.apply(
        {"params": bundle.params}, x, method=CLIPModel.encode_image,
        project=True)
    pre, post = vit_encode_block_fused_sharded(
        bundle.params, x, TINY, mesh, project=True, dtype=jnp.float32,
        interpret=True)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(ref_pre),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(post), np.asarray(ref_post),
                               atol=5e-4, rtol=5e-4)


def test_encode_fastest_mesh_gates(bundle, monkeypatch):
    """Dispatch gate: TP meshes (sharded weights) and non-divisible
    batches fall back to the canonical module; DP meshes take the
    sharded fused path on TPU."""
    import jax

    from aihab_clip_tpu.models import fast_vit
    from aihab_clip_tpu.parallel import make_mesh

    calls = []
    monkeypatch.setattr(
        fast_vit, "vit_encode_block_fused_sharded",
        lambda *a, **k: calls.append("sharded") or bundle.model.apply(
            {"params": a[0]}, a[1], method=CLIPModel.encode_image,
            project=k.get("project", False)))
    monkeypatch.setattr(fast_vit, "dispatch_backend", lambda: "tpu")

    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    dp = make_mesh(jax.devices()[:8])
    fast_vit.encode_image_fastest(bundle.model, bundle.params, x, TINY,
                                  mesh=dp)
    assert calls == ["sharded"]

    tp = make_mesh(jax.devices()[:8], model_parallel=2)
    fast_vit.encode_image_fastest(bundle.model, bundle.params, x, TINY,
                                  mesh=tp)
    assert calls == ["sharded"]  # TP mesh -> canonical, no new call

    x_odd = jnp.zeros((3, 32, 32, 3), jnp.float32)
    fast_vit.encode_image_fastest(bundle.model, bundle.params, x_odd, TINY,
                                  mesh=dp)
    assert calls == ["sharded"]  # non-divisible batch -> canonical


# ---------------------------------------------------------------------------
# PEFT frozen-prefix hybrid: fused forward-only kernels for the frozen
# bottom blocks, canonical differentiable math for the trainable suffix
# ---------------------------------------------------------------------------

def test_hybrid_forward_matches_canonical(bundle, rng):
    from aihab_clip_tpu.models.fast_vit import vit_encode_hybrid

    x = jnp.asarray(rng.standard_normal((3, 32, 32, 3)).astype(np.float32))
    ref_pre, ref_post = bundle.model.apply(
        {"params": bundle.params}, x, method=CLIPModel.encode_image,
        project=True)
    for n_prefix in (0, 2, TINY.vision_layers):
        pre, post = vit_encode_hybrid(
            bundle.params, x, TINY, n_prefix, project=True,
            dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(np.asarray(pre), np.asarray(ref_pre),
                                   atol=5e-4, rtol=5e-4)
        np.testing.assert_allclose(np.asarray(post), np.asarray(ref_post),
                                   atol=5e-4, rtol=5e-4)


def test_hybrid_suffix_grads_match_canonical(bundle, rng):
    """Grads w.r.t. the trainable-suffix params equal the canonical
    tower's; grads w.r.t. the frozen prefix are identically zero
    (stop_gradient)."""
    import jax

    from flax import traverse_util

    from aihab_clip_tpu.models.fast_vit import vit_encode_hybrid

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    n_prefix = 2

    def loss_canonical(params):
        _, post = bundle.model.apply({"params": params}, x,
                                     method=CLIPModel.encode_image,
                                     project=True)
        return jnp.sum(jnp.sin(post.astype(jnp.float32)))

    def loss_hybrid(params):
        _, post = vit_encode_hybrid(params, x, TINY, n_prefix, project=True,
                                    dtype=jnp.float32, interpret=True)
        return jnp.sum(jnp.sin(post.astype(jnp.float32)))

    g_ref = traverse_util.flatten_dict(jax.grad(loss_canonical)(bundle.params))
    g_hyb = traverse_util.flatten_dict(jax.grad(loss_hybrid)(bundle.params))
    suffix = [k for k in g_ref
              if k[:2] == ("visual", "transformer")
              and int(k[2].rsplit("_", 1)[1]) >= n_prefix]
    suffix += [k for k in g_ref if k[:2] in
               {("visual", "ln_post"), ("visual", "proj")}]
    assert suffix
    for k in suffix:
        np.testing.assert_allclose(
            np.asarray(g_hyb[k]), np.asarray(g_ref[k]),
            atol=2e-3, rtol=2e-3, err_msg="/".join(map(str, k)))
    prefix = [k for k in g_ref
              if k[:2] == ("visual", "transformer")
              and int(k[2].rsplit("_", 1)[1]) < n_prefix]
    prefix += [k for k in g_ref if k[0] == "visual"
               and k[1] in ("conv1", "class_embedding",
                            "positional_embedding", "ln_pre")]
    assert prefix
    for k in prefix:
        assert not np.any(np.asarray(g_hyb[k])), "/".join(map(str, k))


class _FakeMesh:
    def __init__(self, **shape):
        self.shape = shape


def test_peft_fused_prefix_len_gates(monkeypatch):
    from aihab_clip_tpu.models import fast_vit

    # non-TPU backend -> disabled
    assert fast_vit.peft_fused_prefix_len(TINY, 2) == 0

    monkeypatch.setattr(fast_vit, "dispatch_backend", lambda: "tpu")
    L = TINY.vision_layers  # 3; groups = stem + 3 blocks + head
    assert fast_vit.peft_fused_prefix_len(TINY, 0) == L
    assert fast_vit.peft_fused_prefix_len(TINY, 1) == L  # head only
    assert fast_vit.peft_fused_prefix_len(TINY, 2) == L - 1
    assert fast_vit.peft_fused_prefix_len(TINY, L + 1) == 0
    assert fast_vit.peft_fused_prefix_len(TINY, L + 2) == 0
    # pure-DP mesh + divisible batch -> shard_mapped prefix enabled
    dp = _FakeMesh(data=4, model=1)
    assert fast_vit.peft_fused_prefix_len(TINY, 2, mesh=dp,
                                          batch_size=16) == L - 1
    # indivisible batch / unknown batch -> disabled
    assert fast_vit.peft_fused_prefix_len(TINY, 2, mesh=dp,
                                          batch_size=6) == 0
    assert fast_vit.peft_fused_prefix_len(TINY, 2, mesh=dp) == 0
    # sharded-weight axes (TP / pipeline) -> disabled
    assert fast_vit.peft_fused_prefix_len(
        TINY, 2, mesh=_FakeMesh(data=2, model=2), batch_size=16) == 0
    assert fast_vit.peft_fused_prefix_len(
        TINY, 2, mesh=_FakeMesh(data=2, stage=4), batch_size=16) == 0
    # non-ViT tower -> disabled
    rn = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=(1, 1, 1, 1),
        vision_width=8, vision_patch_size=None, context_length=77,
        vocab_size=49408, transformer_width=64, transformer_heads=1,
        transformer_layers=2)
    assert fast_vit.peft_fused_prefix_len(rn, 2) == 0


def test_peft_fused_prefix_len_siglip(monkeypatch):
    from aihab_clip_tpu.models import fast_vit
    from aihab_clip_tpu.models.siglip import SIGLIP_ARCHS

    cfg = SIGLIP_ARCHS["SigLIP-Tiny"]  # L=2, narrow
    assert fast_vit.peft_fused_prefix_len(cfg, 1) == 0  # non-TPU
    monkeypatch.setattr(fast_vit, "dispatch_backend", lambda: "tpu")
    # narrow SigLIP towers (W <= 1024) keep the canonical module under
    # auto — SigLIP-L measured the hybrid a wash-to-negative (r5);
    # explicit finetune.fused_prefix > 0 still opts in
    assert fast_vit.peft_fused_prefix_len(cfg, 1) == 0
    wide = SIGLIP_ARCHS["ViT-SO400M-16-SigLIP2-384"]  # W=1152: hybrid on
    assert fast_vit.peft_fused_prefix_len(wide, 11) == \
        wide.vision_layers + 1 - 11
    assert fast_vit.peft_fused_prefix_len(wide, wide.vision_layers + 2) == 0


def test_peft_fused_prefix_len_convnext(monkeypatch):
    """r5: the ConvNeXt hybrid dispatches under auto (median-of-3 A/B/A
    reversed the r3 negative: base_w +53%, large_d +62%, xxlarge wins)."""
    from aihab_clip_tpu.models import fast_vit
    from aihab_clip_tpu.models.clip import CLIP_ARCHS

    cfg = CLIP_ARCHS["convnext_base_w"]
    monkeypatch.setattr(fast_vit, "dispatch_backend", lambda: "tpu")
    total = sum(cfg.vision_layers)
    assert fast_vit.peft_fused_prefix_len(cfg, 2) == total - 1
    assert fast_vit.peft_fused_prefix_len(cfg, total + 2) == 0


def test_hybrid_quant_prefix_forward_and_grads(bundle, rng):
    """int8 frozen prefix (qprefix): forward within int8 tolerance of the
    canonical tower; suffix grads flow; prefix grads identically zero."""
    import jax

    from flax import traverse_util

    from aihab_clip_tpu.models.fast_vit import vit_encode_hybrid
    from aihab_clip_tpu.models.quant_vit import quantize_vit_block

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    n_prefix = 2
    qprefix = {
        f"resblocks_{i}": quantize_vit_block(
            bundle.params["visual"]["transformer"][f"resblocks_{i}"])
        for i in range(n_prefix)}

    ref = np.asarray(bundle.model.apply(
        {"params": bundle.params}, x, method=CLIPModel.encode_image))
    out = np.asarray(vit_encode_hybrid(
        bundle.params, x, TINY, n_prefix, dtype=jnp.float32,
        interpret=True, qprefix=qprefix))
    cos = np.sum(ref * out, -1) / (np.linalg.norm(ref, axis=-1)
                                   * np.linalg.norm(out, axis=-1))
    assert np.all(cos > 0.99), cos

    def loss_hybrid(params):
        _, post = vit_encode_hybrid(params, x, TINY, n_prefix, project=True,
                                    dtype=jnp.float32, interpret=True,
                                    qprefix=qprefix)
        return jnp.sum(jnp.sin(post.astype(jnp.float32)))

    g = traverse_util.flatten_dict(jax.grad(loss_hybrid)(bundle.params))
    suffix = [k for k in g if k[:2] == ("visual", "transformer")
              and int(k[2].rsplit("_", 1)[1]) >= n_prefix]
    assert suffix and any(np.any(np.asarray(g[k])) for k in suffix)
    prefix = [k for k in g if k[:2] == ("visual", "transformer")
              and int(k[2].rsplit("_", 1)[1]) < n_prefix]
    assert prefix
    for k in prefix:
        assert not np.any(np.asarray(g[k])), "/".join(map(str, k))


def test_vit_encode_scan_matches_module():
    """scan-over-blocks canonical CLIP-ViT encode == unrolled module."""
    import jax.numpy as jnp
    import numpy as np

    from aihab_clip_tpu.models import CLIPModel, load
    from aihab_clip_tpu.models.fast_vit import vit_encode_scan

    bundle = load("random:Tiny")
    cfg = bundle.config
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (3, cfg.image_resolution, cfg.image_resolution, 3)), jnp.float32)
    ref_pre, ref_proj = bundle.model.apply(
        {"params": bundle.params}, x,
        method=CLIPModel.encode_image, project=True)
    pre, proj = vit_encode_scan(bundle.params, x, cfg, project=True,
                                dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(ref_pre),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(ref_proj),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_vit_scan_remat_matches_plain():
    """remat=True on the scanned ViT body (the XLA grad-of-scan crash
    workaround) is forward- and gradient-identical to remat=False."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.fast_vit import vit_encode_scan

    bundle = load("random:Tiny")
    cfg = bundle.config
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(
        (2, cfg.image_resolution, cfg.image_resolution, 3)), jnp.float32)

    def loss(params, remat):
        pre = vit_encode_scan(params, x, cfg, dtype=jnp.float32,
                              remat=remat)
        return jnp.sum(jnp.square(pre))

    v_plain, g_plain = jax.value_and_grad(lambda p: loss(p, False))(
        bundle.params)
    v_remat, g_remat = jax.value_and_grad(lambda p: loss(p, True))(
        bundle.params)
    np.testing.assert_allclose(v_plain, v_remat, rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5),
        g_plain, g_remat)


def test_vit_scan_grads_match_module():
    """d(loss)/d(params) through the scanned encode == through the module
    tower (no optimizer amplification; tight tolerance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aihab_clip_tpu.models import CLIPModel, load
    from aihab_clip_tpu.models.fast_vit import vit_encode_scan

    bundle = load("random:Tiny")
    cfg = bundle.config
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(
        (2, cfg.image_resolution, cfg.image_resolution, 3)), jnp.float32)

    def loss_scan(params):
        pre = vit_encode_scan(params, x, cfg, dtype=jnp.float32)
        return jnp.sum(jnp.square(pre))

    def loss_module(params):
        pre = bundle.model.apply({"params": params}, x,
                                 method=CLIPModel.encode_image)
        return jnp.sum(jnp.square(pre))

    g_s = jax.grad(loss_scan)(bundle.params)
    g_m = jax.grad(loss_module)(bundle.params)
    flat_s = jax.tree_util.tree_leaves_with_path(g_s)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(g_m))
    for path, leaf in flat_s:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_m[path]), atol=2e-4,
            rtol=2e-4, err_msg=jax.tree_util.keystr(path))


def test_gelu_act_tower_fast_matches_canonical(rng):
    """LAION-style towers (act='gelu', exact erf — open_clip default for
    non-quickgelu tags) run the same fast path with the activation
    plumbed through config -> plan -> kernels."""
    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
        act="gelu")
    b = load("random:tiny-gelu", random_cfg=cfg, seed=7)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref = b.model.apply({"params": b.params}, x,
                        method=CLIPModel.encode_image)
    out = vit_encode_fast(b.params, x, cfg, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
    # and the gelu tower really differs from a quick_gelu one (the act
    # is not silently ignored anywhere in the chain)
    qcfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2)
    qout = vit_encode_fast(b.params, x, qcfg, dtype=jnp.float32)
    assert np.abs(np.asarray(out) - np.asarray(qout)).max() > 1e-4


def test_gelu_act_full_block_kernel_matches(rng):
    """The merged full-block kernel honors act='gelu' (interpret mode)."""
    from aihab_clip_tpu.ops.block_kernel import full_block_fused

    W, H, HID = 128, 4, 256
    x = jnp.asarray(rng.standard_normal((2, 17, W)) * 0.1, jnp.float32)
    # one fixed weight set for both activations
    a = np.random.default_rng(3)
    wq = jnp.asarray(a.standard_normal((W, 3 * W)) * 0.02, jnp.float32)
    wf = jnp.asarray(a.standard_normal((W, HID)) * 0.02, jnp.float32)
    wp = jnp.asarray(a.standard_normal((HID, W)) * 0.02, jnp.float32)

    def run2(act):
        return np.asarray(full_block_fused(
            x, np.ones(W), np.zeros(W), wq, np.zeros(3 * W),
            jnp.asarray(np.eye(W), jnp.float32), np.zeros(W),
            np.ones(W), np.zeros(W), wf, np.zeros(HID), wp, np.zeros(W),
            heads=H, act=act, interpret=True))

    g = run2("gelu")
    q = run2("quick_gelu")
    assert np.isfinite(g).all()
    assert np.abs(g - q).max() > 1e-5


def test_gelu_act_plan_gates_kernels(monkeypatch):
    """Exact-erf gelu has no Mosaic lowering (erfc unimplemented — probed
    on hardware).  Since r3 the plan maps it to the in-kernel rational
    erf ('gelu_poly'), so gelu towers keep their MLP kernels; the
    AIHAB_NO_GELU_POLY opt-out restores the pre-r3 XLA fallback."""
    from aihab_clip_tpu.models.fast_vit import _fused_block_plan

    gelu_cfg = CLIPConfig(
        embed_dim=512, image_resolution=224, vision_layers=32,
        vision_width=1280, vision_patch_size=14, context_length=77,
        vocab_size=49408, transformer_width=1024, transformer_heads=16,
        transformer_layers=24, act="gelu")
    plan = _fused_block_plan(gelu_cfg, jnp.bfloat16)
    assert plan["act"] == "gelu_poly"
    assert plan["mlp_whole"] or plan["mlp_chunks"] > 0

    monkeypatch.setenv("AIHAB_NO_GELU_POLY", "1")
    plan_off = _fused_block_plan(gelu_cfg, jnp.bfloat16)
    assert plan_off["act"] == "gelu"
    assert not plan_off["merge"]
    assert not plan_off["mlp_whole"]
    assert plan_off["mlp_chunks"] == 0
    monkeypatch.delenv("AIHAB_NO_GELU_POLY")

    # quick_gelu tower of the same dims keeps its kernels and exact act
    q_cfg = CLIPConfig(
        embed_dim=512, image_resolution=224, vision_layers=32,
        vision_width=1280, vision_patch_size=14, context_length=77,
        vocab_size=49408, transformer_width=1024, transformer_heads=16,
        transformer_layers=24)
    qplan = _fused_block_plan(q_cfg, jnp.bfloat16)
    assert qplan["act"] == "quick_gelu"
    assert qplan["mlp_whole"] or qplan["mlp_chunks"] > 0


def test_gelu_poly_block_fused_encode_matches_canonical(rng):
    """act='gelu' towers through the (now-unblocked) fused block kernels
    match the canonical exact-erf module to activation-approx tolerance."""
    from aihab_clip_tpu.models.fast_vit import vit_encode_block_fused

    cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
        act="gelu")
    b = load("random:tiny-gelu-blk", random_cfg=cfg, seed=7)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref = b.model.apply({"params": b.params}, x,
                        method=CLIPModel.encode_image)
    out = vit_encode_block_fused(b.params, x, cfg, dtype=jnp.float32,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_gelu_poly_int8_act_mapping(monkeypatch):
    from aihab_clip_tpu.models.quant_vit import _kernel_act

    gelu_cfg = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2,
        act="gelu")
    assert _kernel_act(gelu_cfg) == "gelu_poly"
    monkeypatch.setenv("AIHAB_NO_GELU_POLY", "1")
    assert _kernel_act(gelu_cfg) == "gelu"
