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
    monkeypatch.setattr(fast_vit.jax, "default_backend", lambda: "tpu")

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
