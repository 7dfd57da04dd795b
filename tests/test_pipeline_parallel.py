"""Pipeline-parallel (GPipe) ViT on the 8-device virtual CPU mesh:
forward parity vs the canonical tower and grad parity through the
scan + ppermute schedule."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aihab_clip_tpu.models import CLIPConfig, CLIPModel, load
from aihab_clip_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_encode,
    place_stage_params,
    stack_stage_params,
)

TINY = CLIPConfig(
    embed_dim=32, image_resolution=16, vision_layers=4, vision_width=64,
    vision_patch_size=8, context_length=77, vocab_size=49408,
    transformer_width=64, transformer_heads=2, transformer_layers=2)


@pytest.fixture(scope="module")
def bundle():
    return load("random:tiny-pipe", random_cfg=TINY, seed=7)


def _images(b=8):
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.standard_normal((b, 16, 16, 3)).astype(np.float32))


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (2, 8), (1, 2)])
def test_pipeline_encode_matches_canonical(bundle, n_stages, n_micro):
    mesh = make_pipeline_mesh(n_stages)
    stacked = place_stage_params(
        mesh, stack_stage_params(bundle.params, TINY.vision_layers, n_stages))
    x = _images()
    ref_pre, ref_post = bundle.model.apply(
        {"params": bundle.params}, x, method=CLIPModel.encode_image,
        project=True)
    pre, post = pipeline_encode(bundle.params, stacked, x, TINY, mesh,
                                num_microbatches=n_micro, project=True,
                                dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(ref_pre),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(post), np.asarray(ref_post),
                               atol=2e-4, rtol=2e-4)


def test_pipeline_grad_parity(bundle):
    """jax.grad through the pipelined schedule == grads of the canonical
    tower, for both the staged block params and the input images."""
    n_stages, n_micro = 4, 2
    mesh = make_pipeline_mesh(n_stages)
    stacked = place_stage_params(
        mesh, stack_stage_params(bundle.params, TINY.vision_layers, n_stages))
    x = _images(4)

    def pipe_loss(stacked, x):
        pre = pipeline_encode(bundle.params, stacked, x, TINY, mesh,
                              num_microbatches=n_micro, dtype=jnp.float32)
        return jnp.sum(pre.astype(jnp.float32) ** 2)

    def ref_loss(params, x):
        pre = bundle.model.apply({"params": params}, x,
                                 method=CLIPModel.encode_image)
        return jnp.sum(pre.astype(jnp.float32) ** 2)

    g_stacked, g_x = jax.grad(pipe_loss, argnums=(0, 1))(stacked, x)
    g_ref_params, g_ref_x = jax.grad(ref_loss, argnums=(0, 1))(
        bundle.params, x)
    g_ref_stacked = stack_stage_params(g_ref_params, TINY.vision_layers,
                                       n_stages)

    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_ref_x),
                               atol=5e-4, rtol=5e-4)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_stacked)
    flat_r = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_flatten_with_path(g_ref_stacked)[0])
    for k, v in flat_p:
        r = flat_r[jax.tree_util.keystr(k)]
        np.testing.assert_allclose(np.asarray(v), np.asarray(r),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=jax.tree_util.keystr(k))


def test_stack_stage_params_shapes(bundle):
    stacked = stack_stage_params(bundle.params, TINY.vision_layers, 2)
    kern = stacked["attn"]["in_proj"]["kernel"]
    assert kern.shape[:2] == (2, 2)          # [stages, layers_per_stage]
    with pytest.raises(ValueError):
        stack_stage_params(bundle.params, TINY.vision_layers, 3)
