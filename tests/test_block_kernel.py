"""Whole-block fused kernels == unfused reference math (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from aihab_clip_tpu.ops.attention import _xla_attention
from aihab_clip_tpu.ops.block_kernel import attn_block_fused, mlp_block_fused


def _ln(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias).astype(
        x.dtype)


def test_attn_block_fused_matches_reference(rng):
    b, s, w, heads = 2, 50, 64, 4
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    wqkv = jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.1).astype(np.float32))
    bqkv = jnp.asarray(rng.standard_normal(3 * w).astype(np.float32) * 0.1)
    wout = jnp.asarray((rng.standard_normal((w, w)) * 0.1).astype(np.float32))
    bout = jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.1)

    ln1 = _ln(x, g, beta)
    qkv = ln1.reshape(b * s, w) @ wqkv + bqkv
    q, k, v = jnp.split(qkv.reshape(b, s, 3 * w), 3, axis=-1)
    attn = _xla_attention(q, k, v, heads)
    ref = x + (attn.reshape(b * s, w) @ wout + bout).reshape(b, s, w)

    out = attn_block_fused(x, g, beta, wqkv, bqkv, wout, bout, heads,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)

    # multi-image grid programs compute identical math (G*S_pad-row
    # LN/QKV/out GEMMs, per-(image, head) attention core)
    out2 = attn_block_fused(x, g, beta, wqkv, bqkv, wout, bout, heads,
                            interpret=True, images_per_program=2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               atol=1e-5, rtol=1e-5)


def test_mlp_block_fused_matches_reference(rng):
    m, w, hidden = 70, 64, 256
    x = jnp.asarray(rng.standard_normal((m, w)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    wfc = jnp.asarray((rng.standard_normal((w, hidden)) * 0.1).astype(np.float32))
    bfc = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * 0.1)
    wpr = jnp.asarray((rng.standard_normal((hidden, w)) * 0.1).astype(np.float32))
    bpr = jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.1)

    ln2 = _ln(x, g, beta)
    h = ln2 @ wfc + bfc
    h = h * jax.nn.sigmoid(1.702 * h)
    ref = x + (h @ wpr + bpr)

    out = mlp_block_fused(x, g, beta, wfc, bfc, wpr, bpr, interpret=True,
                          tile_m=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_mlp_block_split_matches_fused(rng):
    """Hidden-dim-split MLP kernel (for towers whose full weight pair
    exceeds the one-kernel VMEM budget) == the one-kernel formulation,
    for both activations and odd row counts."""
    from aihab_clip_tpu.ops.block_kernel import mlp_block_split

    m, w, hidden = 70, 64, 256
    x = jnp.asarray(rng.standard_normal((m, w)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    wfc = jnp.asarray((rng.standard_normal((w, hidden)) * 0.1).astype(np.float32))
    bfc = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * 0.1)
    wpr = jnp.asarray((rng.standard_normal((hidden, w)) * 0.1).astype(np.float32))
    bpr = jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.1)

    ref = mlp_block_fused(x, g, beta, wfc, bfc, wpr, bpr, interpret=True,
                          tile_m=64)
    for n_chunks in (1, 2, 4):
        for f32_partial in (False, True):
            out = mlp_block_split(x, g, beta, wfc, bfc, wpr, bpr,
                                  n_chunks=n_chunks, interpret=True,
                                  tile_m=64, f32_partial=f32_partial)
            assert out.dtype == x.dtype
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-4, rtol=2e-4)

    # bf16 towers: against an fp32 reference of the same math, the f32
    # partial must be at least as accurate as the bf16 partial chain (it
    # removes one bf16 rounding per chunk boundary; the GEMM inputs are
    # bf16 either way) — and both must stay close to the reference
    xb = x.astype(jnp.bfloat16)
    wfcb, wprb = wfc.astype(jnp.bfloat16), wpr.astype(jnp.bfloat16)
    ln2b = _ln(xb.astype(jnp.float32), g, beta)
    hb = ln2b.astype(jnp.bfloat16).astype(jnp.float32) @ \
        wfcb.astype(jnp.float32)
    hb = jax.nn.sigmoid(1.702 * (hb + bfc)) * (hb + bfc)
    ref_f32 = np.asarray(
        xb.astype(jnp.float32) + bpr +
        hb.astype(jnp.bfloat16).astype(jnp.float32) @
        wprb.astype(jnp.float32))
    outs = {}
    for f32_partial in (False, True):
        outs[f32_partial] = np.asarray(
            mlp_block_split(xb, g, beta, wfcb, bfc, wprb, bpr, n_chunks=4,
                            interpret=True, tile_m=64,
                            f32_partial=f32_partial), dtype=np.float32)
    err16 = np.abs(outs[False] - ref_f32).mean()
    err32 = np.abs(outs[True] - ref_f32).mean()
    assert err32 <= err16 * 1.001, (err32, err16)
    np.testing.assert_allclose(outs[False], ref_f32, atol=0.15, rtol=0.15)

    # gelu_tanh (SigLIP) against plain jnp math
    ln2 = _ln(x, g, beta)
    h = jax.nn.gelu(ln2 @ wfc + bfc, approximate=True)
    ref_tanh = x + (h @ wpr + bpr)
    out = mlp_block_split(x, g, beta, wfc, bfc, wpr, bpr, n_chunks=2,
                          act="gelu_tanh", interpret=True, tile_m=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_tanh),
                               atol=2e-4, rtol=2e-4)


def test_block_fused_encode_matches_canonical(rng):
    from aihab_clip_tpu.models import CLIPConfig, CLIPModel, load
    from aihab_clip_tpu.models.fast_vit import vit_encode_block_fused

    tiny = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=3, vision_width=128,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2)
    b = load("random:tiny-blockfused", random_cfg=tiny, seed=11)
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 3)).astype(np.float32))
    ref_pre, ref_post = b.model.apply({"params": b.params}, x,
                                      method=CLIPModel.encode_image,
                                      project=True)
    pre, post = vit_encode_block_fused(b.params, x, tiny, project=True,
                                       dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(ref_pre),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(post), np.asarray(ref_post),
                               atol=5e-4, rtol=5e-4)


def test_block_fused_encode_split_mlp_path(rng, monkeypatch):
    """Towers whose MLP weights exceed the whole-kernel VMEM budget fall
    back to the split LN+GEMM / GEMM+residual kernels — same numerics."""
    from aihab_clip_tpu.models import CLIPConfig, CLIPModel, load
    from aihab_clip_tpu.models import fast_vit

    tiny = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2)
    b = load("random:tiny-blocksplit", random_cfg=tiny, seed=12)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref = b.model.apply({"params": b.params}, x,
                        method=CLIPModel.encode_image)
    monkeypatch.setattr(fast_vit, "MLP_WHOLE_KERNEL_MAX_BYTES", 0)
    out = fast_vit.vit_encode_block_fused(b.params, x, tiny,
                                          dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_block_fused_encode_split_chunks_path(rng, monkeypatch):
    """Budget below the full pair but above half: hidden-dim-split kernels
    dispatch (the ViT-L case) — same numerics as the canonical tower."""
    from aihab_clip_tpu.models import CLIPConfig, CLIPModel, load
    from aihab_clip_tpu.models import fast_vit

    tiny = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2)
    b = load("random:tiny-blockchunks", random_cfg=tiny, seed=13)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref = b.model.apply({"params": b.params}, x,
                        method=CLIPModel.encode_image)
    pair = 2 * 128 * 512 * 4  # fp32 c_fc+c_proj bytes for this tiny tower
    monkeypatch.setattr(fast_vit, "MLP_WHOLE_KERNEL_MAX_BYTES", pair // 2)
    out = fast_vit.vit_encode_block_fused(b.params, x, tiny,
                                          dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_mlp_block_train_grad_parity(rng):
    """Differentiable whole-block MLP: forward AND all seven gradients
    match the canonical XLA formulation."""
    from aihab_clip_tpu.ops.block_kernel import mlp_block_train

    m, w, hidden = 70, 128, 256
    x = jnp.asarray(rng.standard_normal((m, w)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    wfc = jnp.asarray((rng.standard_normal((w, hidden)) * 0.05).astype(np.float32))
    bfc = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * 0.1)
    wpr = jnp.asarray((rng.standard_normal((hidden, w)) * 0.05).astype(np.float32))
    bpr = jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.1)

    def canonical(x, g, beta, wfc, bfc, wpr, bpr):
        ln2 = _ln(x, g, beta)
        h = ln2 @ wfc + bfc
        h = h * jax.nn.sigmoid(1.702 * h)
        return x + (h @ wpr + bpr)

    args = (x, g, beta, wfc, bfc, wpr, bpr)
    out_c = canonical(*args)
    out_f = mlp_block_train(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_c),
                               atol=1e-4, rtol=1e-4)

    gc = jax.grad(lambda *a: jnp.sum(jnp.sin(canonical(*a))),
                  argnums=tuple(range(7)))(*args)
    gf = jax.grad(lambda *a: jnp.sum(jnp.sin(mlp_block_train(
        *a, interpret=True))), argnums=tuple(range(7)))(*args)
    for name, a, b in zip(("dx", "dgamma", "dbeta", "dwfc", "dbfc", "dwpr",
                           "dbpr"), gf, gc):
        rel = (np.linalg.norm(np.asarray(a) - np.asarray(b))
               / (np.linalg.norm(np.asarray(b)) + 1e-12))
        assert rel < 1e-4, (name, rel)


def test_vit_encode_train_grad_parity(rng):
    """Full train tower (canonical attention half + fused MLP half):
    loss and every param gradient match the canonical Flax model."""
    from aihab_clip_tpu.models import CLIPConfig, CLIPModel, load
    from aihab_clip_tpu.models.fast_vit import vit_encode_train

    tiny = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=3, vision_width=128,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=2, transformer_layers=2)
    b = load("random:tiny-trainfused", random_cfg=tiny, seed=11)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    tw = jnp.asarray(rng.standard_normal((tiny.embed_dim, 5)).astype(np.float32))

    def loss_canon(params):
        _, f = b.model.apply({"params": params}, x,
                             method=CLIPModel.encode_image, project=True)
        return jnp.sum(jnp.sin(100.0 * f @ tw))

    def loss_fast(params):
        _, f = vit_encode_train(params, x, tiny, project=True,
                                dtype=jnp.float32, interpret=True)
        return jnp.sum(jnp.sin(100.0 * f @ tw))

    l1, g1 = jax.value_and_grad(loss_canon)(b.params)
    l2, g2 = jax.value_and_grad(loss_fast)(b.params)
    assert abs(float(l1) - float(l2)) / abs(float(l1)) < 1e-5
    flat2 = {jax.tree_util.keystr(k): v
             for k, v in jax.tree_util.tree_leaves_with_path(g2)}
    for k, v1 in jax.tree_util.tree_leaves_with_path(g1):
        v2 = flat2[jax.tree_util.keystr(k)]
        rel = (np.linalg.norm(np.asarray(v1) - np.asarray(v2))
               / (np.linalg.norm(np.asarray(v1)) + 1e-12))
        assert rel < 5e-5, (jax.tree_util.keystr(k), rel)


def test_block_fused_encode_split_attention_path(rng, monkeypatch):
    """Long-sequence towers exceed the unsplit attention kernel's VMEM
    (ViT-L@336 failed to compile before this fallback existed) — force
    the head-group-split dispatch and check numerics."""
    from aihab_clip_tpu.models import CLIPConfig, CLIPModel, load
    from aihab_clip_tpu.models import fast_vit

    tiny = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2)
    assert tiny.vision_heads % 2 == 0, "tiny config must have even heads"
    b = load("random:tiny-attnsplit", random_cfg=tiny, seed=14)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref = b.model.apply({"params": b.params}, x,
                        method=CLIPModel.encode_image)
    monkeypatch.setattr(fast_vit, "ATTN_WHOLE_KERNEL_MAX_BYTES", 0)
    out = fast_vit.vit_encode_block_fused(b.params, x, tiny,
                                          dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_full_block_fused_matches_two_kernel_dispatch(rng):
    """Merged attn+MLP single-program block == composing the two
    whole-block kernels (same math, no inter-half HBM hop)."""
    from aihab_clip_tpu.ops.block_kernel import full_block_fused

    b, s, w, heads, hidden = 2, 50, 64, 4, 256
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
    g1 = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    wqkv = jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.1).astype(np.float32))
    bqkv = jnp.asarray(rng.standard_normal(3 * w).astype(np.float32) * 0.1)
    wout = jnp.asarray((rng.standard_normal((w, w)) * 0.1).astype(np.float32))
    bout = jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.1)
    g2 = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    wfc = jnp.asarray((rng.standard_normal((w, hidden)) * 0.1).astype(np.float32))
    bfc = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * 0.1)
    wpr = jnp.asarray((rng.standard_normal((hidden, w)) * 0.1).astype(np.float32))
    bpr = jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.1)

    y1 = attn_block_fused(x, g1, b1, wqkv, bqkv, wout, bout, heads,
                          interpret=True)
    ref = mlp_block_fused(y1.reshape(b * s, w), g2, b2, wfc, bfc, wpr, bpr,
                          interpret=True, tile_m=64).reshape(b, s, w)

    for chunks in (1, 2):
        out = full_block_fused(x, g1, b1, wqkv, bqkv, wout, bout,
                               g2, b2, wfc, bfc, wpr, bpr, heads,
                               mlp_chunks=chunks, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=5e-4)

    # multi-image programs (short-sequence M-tile fill, ViT-B/32): G=2
    # packs both images into one program; G=3 does not divide b and must
    # fall back to the per-image grid
    for g in (2, 3):
        out = full_block_fused(x, g1, b1, wqkv, bqkv, wout, bout,
                               g2, b2, wfc, bfc, wpr, bpr, heads,
                               mlp_chunks=2, images_per_program=g,
                               interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-4, rtol=5e-4)


def test_block_fused_encode_merged_vs_two_kernel_dispatch(rng):
    """merge_blocks='auto' (merged single-program blocks, the ViT-B
    dispatch) == merge_blocks='off' (two-kernel) == canonical tower."""
    from aihab_clip_tpu.models import CLIPConfig, CLIPModel, load
    from aihab_clip_tpu.models import fast_vit

    tiny = CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=2, vision_width=128,
        vision_patch_size=8, context_length=77, vocab_size=49408,
        transformer_width=64, transformer_heads=1, transformer_layers=2)
    b = load("random:tiny-merged", random_cfg=tiny, seed=15)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref = b.model.apply({"params": b.params}, x,
                        method=CLIPModel.encode_image)
    merged = fast_vit.vit_encode_block_fused(b.params, x, tiny,
                                             dtype=jnp.float32,
                                             interpret=True)
    two = fast_vit.vit_encode_block_fused(b.params, x, tiny,
                                          dtype=jnp.float32,
                                          merge_blocks="off",
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(two), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_full_block_attn_impl_variants_match(rng):
    """Every `attn_impl` A/B variant matches the dispatched base path to
    bf16 tolerance (interpret-mode; the TPU A/B lives in
    tools_dev/ab_attn_impl.py — base stays dispatched, see PERF_NOTES
    'ViT-B attention core')."""
    import jax.numpy as jnp

    from aihab_clip_tpu.ops.block_kernel import full_block_fused

    B, S, W, H, HID = 2, 37, 128, 4, 256
    x = jnp.asarray(rng.standard_normal((B, S, W)) * 0.1, jnp.bfloat16)
    args = dict(
        ln1_scale=rng.standard_normal(W),
        ln1_bias=rng.standard_normal(W) * 0.1,
        w_qkv=jnp.asarray(rng.standard_normal((W, 3 * W)) * 0.02,
                          jnp.bfloat16),
        b_qkv=rng.standard_normal(3 * W) * 0.1,
        w_out=jnp.asarray(rng.standard_normal((W, W)) * 0.02, jnp.bfloat16),
        b_out=rng.standard_normal(W) * 0.1,
        ln2_scale=rng.standard_normal(W),
        ln2_bias=rng.standard_normal(W) * 0.1,
        w_fc=jnp.asarray(rng.standard_normal((W, HID)) * 0.02, jnp.bfloat16),
        b_fc=rng.standard_normal(HID) * 0.1,
        w_proj=jnp.asarray(rng.standard_normal((HID, W)) * 0.02,
                           jnp.bfloat16),
        b_proj=rng.standard_normal(W) * 0.1,
    )
    base = np.asarray(full_block_fused(x, heads=H, attn_impl="base",
                                       interpret=True, **args), np.float32)
    for impl in ("foldnorm", "pair", "batched"):
        out = np.asarray(full_block_fused(x, heads=H, attn_impl=impl,
                                          interpret=True, **args),
                         np.float32)
        assert np.abs(out - base).max() < 0.02, impl
