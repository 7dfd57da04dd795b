"""int8 (W8A8) quantized encode path: primitive error bounds, tower
fidelity vs the bf16/fp32 canonical model, and zero-shot prediction
agreement."""

import numpy as np
import pytest

import jax.numpy as jnp

from aihab_clip_tpu.models import CLIPConfig, CLIPModel, load
from aihab_clip_tpu.models.quant_vit import quantize_vit_params, vit_encode_int8
from aihab_clip_tpu.ops.quant import (
    quant_dense,
    quantize_activation,
    quantize_weight,
)

TINY = CLIPConfig(
    embed_dim=32, image_resolution=32, vision_layers=3, vision_width=128,
    vision_patch_size=8, context_length=77, vocab_size=49408,
    transformer_width=64, transformer_heads=1, transformer_layers=2)


@pytest.fixture(scope="module")
def bundle():
    return load("random:tiny-quant", random_cfg=TINY, seed=7)


def test_weight_quant_roundtrip(rng):
    w = rng.standard_normal((64, 32)).astype(np.float32)
    w8, scale = quantize_weight(jnp.asarray(w))
    w_hat = np.asarray(w8, np.float32) * np.asarray(scale)[None, :]
    # symmetric per-channel int8: max error is half a quantization step
    step = np.asarray(scale)[None, :]
    assert np.all(np.abs(w_hat - w) <= 0.5 * step + 1e-7)


def test_activation_quant_roundtrip(rng):
    x = rng.standard_normal((8, 64)).astype(np.float32) * 3.0
    x8, scale = quantize_activation(jnp.asarray(x))
    x_hat = np.asarray(x8, np.float32) * np.asarray(scale)
    assert np.all(np.abs(x_hat - x) <= 0.5 * np.asarray(scale) + 1e-7)


def test_quant_dense_close_to_float(rng):
    x = rng.standard_normal((16, 128)).astype(np.float32)
    w = rng.standard_normal((128, 64)).astype(np.float32)
    b = rng.standard_normal(64).astype(np.float32)
    ref = x @ w + b
    w8, ws = quantize_weight(jnp.asarray(w))
    out = np.asarray(quant_dense(jnp.asarray(x), w8, ws, jnp.asarray(b)))
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_int8_tower_cosine_vs_canonical(bundle, rng):
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(bundle.model.apply({"params": bundle.params}, x,
                                        method=CLIPModel.encode_image),
                     np.float32)
    qp = quantize_vit_params(bundle.params, TINY)
    out = np.asarray(vit_encode_int8(qp, x, TINY, dtype=jnp.float32),
                     np.float32)
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1))
    assert np.all(cos > 0.99), cos


def test_int8_projected_shapes(bundle, rng):
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    qp = quantize_vit_params(bundle.params, TINY)
    pre, post = vit_encode_int8(qp, x, TINY, project=True,
                                dtype=jnp.float32)
    assert pre.shape == (2, TINY.vision_width)
    assert post.shape == (2, TINY.embed_dim)


def test_int8_zero_shot_agreement(bundle, rng):
    """Predictions through a synthetic text head agree with bf16-path
    predictions on the vast majority of inputs."""
    n_cls, n = 20, 64
    x = jnp.asarray(rng.standard_normal((n, 32, 32, 3)).astype(np.float32))
    tw = jnp.asarray(rng.standard_normal((TINY.embed_dim, n_cls))
                     .astype(np.float32))

    def predict(feats):
        f = np.asarray(feats, np.float32)
        f = f / np.maximum(np.linalg.norm(f, axis=-1, keepdims=True), 1e-12)
        return np.argmax(f @ np.asarray(tw), axis=-1)

    _, ref_post = bundle.model.apply({"params": bundle.params}, x,
                                     method=CLIPModel.encode_image,
                                     project=True)
    qp = quantize_vit_params(bundle.params, TINY)
    _, q_post = vit_encode_int8(qp, x, TINY, project=True,
                                dtype=jnp.float32)
    agree = float(np.mean(predict(ref_post) == predict(q_post)))
    assert agree >= 0.9, agree


@pytest.mark.slow
def test_int8_vitb_shapes():
    b = load("random:ViT-B/16", seed=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 224, 224, 3)).astype(np.float32))
    qp = quantize_vit_params(b.params, b.config)
    out = vit_encode_int8(qp, x, b.config, dtype=jnp.float32)
    assert out.shape == (1, 768)


def test_fused_quant_matmul_matches_unfused(rng):
    from aihab_clip_tpu.ops.quant_matmul import quant_matmul_fused

    x = jnp.asarray(rng.standard_normal((130, 128)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    w8, ws = quantize_weight(w)
    ref = np.asarray(quant_dense(x, w8, ws, b))
    out = np.asarray(quant_matmul_fused(x, w8, ws, b, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    # gelu + residual epilogue
    r = jnp.asarray(rng.standard_normal((130, 256)).astype(np.float32))
    ref2 = np.asarray(quant_dense(x, w8, ws, b, act="quick_gelu")) + np.asarray(r)
    out2 = np.asarray(quant_matmul_fused(x, w8, ws, b, act="quick_gelu",
                                         residual=r, interpret=True))
    np.testing.assert_allclose(out2, ref2, atol=1e-4, rtol=1e-4)


def test_fused_quant_matmul_ln_prologue(rng):
    from aihab_clip_tpu.models.quant_vit import _ln
    from aihab_clip_tpu.ops.quant_matmul import quant_matmul_fused

    x = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32) * 2)
    w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    w8, ws = quantize_weight(w)
    ref = np.asarray(quant_dense(_ln(x, g, beta), w8, ws, b))
    out = np.asarray(quant_matmul_fused(x, w8, ws, b, ln_scale=g,
                                        ln_bias=beta, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_chained_int8_mlp_matches_unfused(rng):
    """qout (LN+GEMM+GELU+requant) -> q8in (int8-input GEMM + residual)
    equals the unfused LN -> quant_dense -> quant_dense chain."""
    from aihab_clip_tpu.models.quant_vit import _ln
    from aihab_clip_tpu.ops.quant_matmul import (
        quant_matmul_fused_qout,
        quant_matmul_q8in,
    )

    x = jnp.asarray(rng.standard_normal((70, 128)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((70, 128)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    w18, w1s = quantize_weight(w1)
    w28, w2s = quantize_weight(w2)

    hdn_ref = quant_dense(_ln(x, g, beta), w18, w1s, b1, act="quick_gelu")
    ref = np.asarray(quant_dense(hdn_ref, w28, w2s, b2)) + np.asarray(r)

    h8, hs = quant_matmul_fused_qout(x, w18, w1s, b1, g, beta,
                                     interpret=True)
    out = np.asarray(quant_matmul_q8in(h8, hs, w28, w2s, b2, r,
                                       interpret=True))
    # both sides quantize the hidden activation (different rounding of the
    # same step); bound the relative error instead of elementwise equality
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_chained_int8_mlp_hidden_chunked_matches_whole(rng):
    """Hidden-dim-chunked chained pair (the ViT-bigG recipe: c_fc slices
    small enough for the one-matrix VMEM budget) == the unchunked chain
    up to f32 accumulation order and per-chunk requant rounding."""
    from aihab_clip_tpu.models.quant_vit import _chained_int8_mlp

    x = jnp.asarray(rng.standard_normal((70, 128)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
    b1 = jnp.asarray(rng.standard_normal(256).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
    b2 = jnp.asarray(rng.standard_normal(128).astype(np.float32))
    w18, w1s = quantize_weight(w1)
    w28, w2s = quantize_weight(w2)
    fc = {"w8": w18, "scale": w1s, "bias": b1}
    pr = {"w8": w28, "scale": w2s, "bias": b2}

    ref = np.asarray(_chained_int8_mlp(x, fc, pr, g, beta,
                                       act="quick_gelu", n_ch=1,
                                       interpret=True))
    for n_ch in (2, 4):
        out = np.asarray(_chained_int8_mlp(x, fc, pr, g, beta,
                                           act="quick_gelu", n_ch=n_ch,
                                           interpret=True))
        rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
        assert rel < 0.02, (n_ch, rel)


def test_whole_block_int8_mlp_matches_chained(rng):
    """One-kernel LN->c_fc->act->requant->c_proj->+residual equals the
    qout->q8in pair (same math, no HBM hop for the int8 hidden)."""
    from aihab_clip_tpu.ops.quant_matmul import (
        quant_matmul_fused_qout,
        quant_matmul_q8in,
        quant_mlp_block_fused,
    )

    for act, eps in (("quick_gelu", 1e-5), ("gelu_tanh", 1e-6)):
        x = jnp.asarray(rng.standard_normal((70, 128)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal(128).astype(np.float32))
        beta = jnp.asarray(rng.standard_normal(128).astype(np.float32))
        w1 = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32))
        b1 = jnp.asarray(rng.standard_normal(256).astype(np.float32))
        w2 = jnp.asarray(rng.standard_normal((256, 128)).astype(np.float32))
        b2 = jnp.asarray(rng.standard_normal(128).astype(np.float32))
        w18, w1s = quantize_weight(w1)
        w28, w2s = quantize_weight(w2)

        h8, hs = quant_matmul_fused_qout(x, w18, w1s, b1, g, beta, act=act,
                                         ln_eps=eps, interpret=True)
        ref = np.asarray(quant_matmul_q8in(h8, hs, w28, w2s, b2, x,
                                           interpret=True))
        out = np.asarray(quant_mlp_block_fused(
            x, w18, w1s, b1, w28, w2s, b2, g, beta, act=act, ln_eps=eps,
            interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# SigLIP tower quantization
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_siglip_int8_cosine_vs_canonical(rng):
    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.quant_siglip import (
        quantize_siglip_params,
        siglip_encode_int8,
    )

    b = load("random:SigLIP-Tiny", seed=3)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(
        b.model.apply({"params": b.params}, x,
                      method=type(b.model).encode_image), np.float32)
    qp = quantize_siglip_params(b.params, b.config)
    out = np.asarray(siglip_encode_int8(qp, b.params, x, b.config,
                                        dtype=jnp.float32), np.float32)
    assert out.shape == ref.shape
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1))
    assert np.all(cos > 0.99), cos


def test_whole_block_int8_attn_matches_bf16_block(rng):
    """quant_attn_block_fused == the bf16 whole-block attention kernel up
    to int8 weight/activation quantization error (cosine > 0.999)."""
    from aihab_clip_tpu.ops.block_kernel import attn_block_fused
    from aihab_clip_tpu.ops.quant import quantize_weight
    from aihab_clip_tpu.ops.quant_matmul import quant_attn_block_fused

    b, s, w, heads = 2, 50, 64, 4
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    wqkv = jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.1).astype(np.float32))
    bqkv = jnp.asarray(rng.standard_normal(3 * w).astype(np.float32) * 0.1)
    wout = jnp.asarray((rng.standard_normal((w, w)) * 0.1).astype(np.float32))
    bout = jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.1)

    ref = attn_block_fused(x, g, beta, wqkv, bqkv, wout, bout, heads,
                           interpret=True)
    q8, qs = quantize_weight(wqkv)
    o8, osc = quantize_weight(wout)
    out = quant_attn_block_fused(x, q8, qs, bqkv, o8, osc, bout, g, beta,
                                 heads, interpret=True)
    ref_f = np.asarray(ref, np.float32).reshape(-1)
    out_f = np.asarray(out, np.float32).reshape(-1)
    cos = float(ref_f @ out_f / (np.linalg.norm(ref_f)
                                 * np.linalg.norm(out_f)))
    assert cos > 0.999, cos


def test_int8_whole_block_tower_matches_xla_impl(bundle, rng):
    """impl='pallas' (whole-block kernels, interpret) tracks impl='xla'
    to quantization-noise tolerance through the full tiny tower."""
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 3)).astype(np.float32))
    qp = quantize_vit_params(bundle.params, TINY)
    ref = np.asarray(vit_encode_int8(qp, x, TINY, dtype=jnp.float32,
                                     impl="xla"), np.float32)
    out = np.asarray(vit_encode_int8(qp, x, TINY, dtype=jnp.float32,
                                     impl="pallas", interpret=True),
                     np.float32)
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1))
    assert np.all(cos > 0.995), cos


def test_int8_chained_tower_matches_xla_impl(bundle, rng):
    """impl='chained' (per-GEMM fused kernels, interpret) stays available
    and tracks impl='xla'."""
    x = jnp.asarray(rng.standard_normal((3, 32, 32, 3)).astype(np.float32))
    qp = quantize_vit_params(bundle.params, TINY)
    ref = np.asarray(vit_encode_int8(qp, x, TINY, dtype=jnp.float32,
                                     impl="xla"), np.float32)
    out = np.asarray(vit_encode_int8(qp, x, TINY, dtype=jnp.float32,
                                     impl="chained", interpret=True),
                     np.float32)
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1))
    assert np.all(cos > 0.995), cos


def test_split_attn_block_matches_bf16_block(rng):
    """Head-group-split whole-block int8 attention (the SigLIP dispatch)
    == the float whole-block formulation to quantization tolerance, for
    every group count."""
    from aihab_clip_tpu.ops.block_kernel import attn_block_fused
    from aihab_clip_tpu.ops.quant import quantize_weight
    from aihab_clip_tpu.ops.quant_matmul import (
        quant_attn_block_split,
        regroup_attn_weights,
    )

    b, s, w, heads = 2, 50, 64, 4
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    beta = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    wqkv = jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.1).astype(np.float32))
    bqkv = jnp.asarray(rng.standard_normal(3 * w).astype(np.float32) * 0.1)
    wout = jnp.asarray((rng.standard_normal((w, w)) * 0.1).astype(np.float32))
    bout = jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.1)

    ref = np.asarray(attn_block_fused(x, g, beta, wqkv, bqkv, wout, bout,
                                      heads, interpret=True),
                     np.float32).ravel()
    q8, qs = quantize_weight(wqkv)
    o8, osc = quantize_weight(wout)
    for n_groups in (1, 2, 4):
        wg, sg, bg, og = regroup_attn_weights(q8, qs, bqkv, o8, heads,
                                              n_groups)
        out = np.asarray(
            quant_attn_block_split(x, wg, sg, bg, og, osc, bout, g, beta,
                                   heads, n_groups, interpret=True),
            np.float32).ravel()
        cos = float(ref @ out / (np.linalg.norm(ref) * np.linalg.norm(out)))
        assert cos > 0.999, (n_groups, cos)


@pytest.mark.slow
def test_siglip_int8_split_attn_matches_xla(rng):
    """siglip_encode_int8 attn_impl='split' (interpret) tracks the xla
    int8 reference through the full tiny tower."""
    from aihab_clip_tpu.models import load
    from aihab_clip_tpu.models.quant_siglip import (
        quantize_siglip_params,
        siglip_encode_int8,
    )

    b = load("random:SigLIP-Tiny", seed=7)
    qp = quantize_siglip_params(b.params, b.config)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    ref = np.asarray(siglip_encode_int8(qp, b.params, x, b.config,
                                        dtype=jnp.float32, impl="xla"),
                     np.float32)
    out = np.asarray(siglip_encode_int8(qp, b.params, x, b.config,
                                        dtype=jnp.float32, impl="pallas",
                                        attn_impl="split", interpret=True),
                     np.float32)
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1))
    assert np.all(cos > 0.99), cos


def test_int8_full_block_matches_two_kernel_dispatch(rng):
    """Merged int8 attn+MLP single-program block == composing
    quant_attn_block_fused + quant_mlp_block_fused (chunks=1 is the same
    math; chunks=2 requantizes per hidden slice — cosine-level match)."""
    from aihab_clip_tpu.ops.quant import quantize_weight
    from aihab_clip_tpu.ops.quant_matmul import (
        quant_attn_block_fused,
        quant_full_block_fused,
        quant_mlp_block_fused,
    )

    b, s, w, heads, hidden = 2, 50, 64, 4, 256
    x = jnp.asarray(rng.standard_normal((b, s, w)).astype(np.float32))
    g1 = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    be1 = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    wqkv = jnp.asarray((rng.standard_normal((w, 3 * w)) * 0.1).astype(np.float32))
    bqkv = jnp.asarray(rng.standard_normal(3 * w).astype(np.float32) * 0.1)
    wout = jnp.asarray((rng.standard_normal((w, w)) * 0.1).astype(np.float32))
    bout = jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.1)
    g2 = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    be2 = jnp.asarray(rng.standard_normal(w).astype(np.float32))
    wfc = jnp.asarray((rng.standard_normal((w, hidden)) * 0.1).astype(np.float32))
    bfc = jnp.asarray(rng.standard_normal(hidden).astype(np.float32) * 0.1)
    wpr = jnp.asarray((rng.standard_normal((hidden, w)) * 0.1).astype(np.float32))
    bpr = jnp.asarray(rng.standard_normal(w).astype(np.float32) * 0.1)

    q8, qs = quantize_weight(wqkv)
    o8, osc = quantize_weight(wout)
    w18, w1s = quantize_weight(wfc)
    w28, w2s = quantize_weight(wpr)

    y1 = quant_attn_block_fused(x, q8, qs, bqkv, o8, osc, bout, g1, be1,
                                heads, interpret=True)
    ref = np.asarray(quant_mlp_block_fused(
        y1.reshape(b * s, w), w18, w1s, bfc, w28, w2s, bpr, g2, be2,
        interpret=True)).reshape(b, s, w)

    out1 = np.asarray(quant_full_block_fused(
        x, q8, qs, bqkv, o8, osc, bout, g1, be1, w18, w1s, bfc,
        w28, w2s, bpr, g2, be2, heads, mlp_chunks=1, interpret=True))
    np.testing.assert_allclose(out1, ref, atol=1e-4, rtol=1e-4)

    out2 = np.asarray(quant_full_block_fused(
        x, q8, qs, bqkv, o8, osc, bout, g1, be1, w18, w1s, bfc,
        w28, w2s, bpr, g2, be2, heads, mlp_chunks=2, interpret=True))
    rf, of = ref.reshape(-1), out2.reshape(-1)
    cos = float(rf @ of / (np.linalg.norm(rf) * np.linalg.norm(of)))
    assert cos > 0.999, cos

    # multi-image grouped programs (r5): per-row quantize scales are
    # row-local, so G>1 must be bit-identical to G=1
    out_g2 = np.asarray(quant_full_block_fused(
        x, q8, qs, bqkv, o8, osc, bout, g1, be1, w18, w1s, bfc,
        w28, w2s, bpr, g2, be2, heads, mlp_chunks=1, interpret=True,
        images_per_program=2))
    np.testing.assert_allclose(out_g2, out1, atol=1e-6, rtol=1e-6)

    # a non-divisor G falls back to the largest power-of-two divisor
    out_g8 = np.asarray(quant_full_block_fused(
        x, q8, qs, bqkv, o8, osc, bout, g1, be1, w18, w1s, bfc,
        w28, w2s, bpr, g2, be2, heads, mlp_chunks=1, interpret=True,
        images_per_program=8))
    np.testing.assert_allclose(out_g8, out1, atol=1e-6, rtol=1e-6)
