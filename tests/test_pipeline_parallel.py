"""Pipeline-parallel (GPipe) ViT on the 8-device virtual CPU mesh:
forward parity vs the canonical tower and grad parity through the
scan + ppermute schedule."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # GPipe parity tier (dryrun_multichip covers the smoke)

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


def test_dp_pp_composed_mesh_parity(bundle):
    """(data=2, stage=4) composed mesh: batch sharded over data, each
    replica pipelining its own shard — matches the canonical tower."""
    mesh = make_pipeline_mesh(4, data_parallel=2)
    assert dict(mesh.shape) == {"data": 2, "stage": 4}
    stacked = place_stage_params(
        mesh, stack_stage_params(bundle.params, TINY.vision_layers, 4))
    x = _images(8)
    ref = bundle.model.apply({"params": bundle.params}, x,
                             method=CLIPModel.encode_image)
    pre = pipeline_encode(bundle.params, stacked, x, TINY, mesh,
                          num_microbatches=4, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_dp_pp_grad_parity(bundle):
    """Grads through the composed mesh accumulate across data replicas
    (shard_map transpose psums the replicated stage params over data)."""
    mesh = make_pipeline_mesh(2, data_parallel=2)
    stacked = place_stage_params(
        mesh, stack_stage_params(bundle.params, TINY.vision_layers, 2))
    x = _images(8)

    def pipe_loss(stacked):
        pre = pipeline_encode(bundle.params, stacked, x, TINY, mesh,
                              num_microbatches=2, dtype=jnp.float32)
        return jnp.sum(pre.astype(jnp.float32) ** 2)

    def ref_loss(params):
        pre = bundle.model.apply({"params": params}, x,
                                 method=CLIPModel.encode_image)
        return jnp.sum(pre.astype(jnp.float32) ** 2)

    g = jax.grad(pipe_loss)(stacked)
    g_ref = stack_stage_params(jax.grad(ref_loss)(bundle.params),
                               TINY.vision_layers, 2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4), g, g_ref)


def test_pipeline_train_step_parity(bundle):
    """One pipeline-parallel PEFT step == one canonical partitioned
    step: same loss/metrics, trainable layers move identically, frozen
    layers stay bit-identical (masked grads -> exact Adam no-op)."""
    from flax import traverse_util

    from aihab_clip_tpu.train.peft import (
        PEFTConfig, build_lock_mask, make_train_step, partition_params)
    from aihab_clip_tpu.train.pipeline_peft import (
        init_pipeline_trainable, make_pipeline_train_step)

    n_stages, unlocked_layers = 2, 2
    num_classes, lr = 5, 1e-3
    mesh = make_pipeline_mesh(n_stages)
    cfg = PEFTConfig(resolution=16, num_classes=num_classes, lr=lr,
                     epochs=1, crop_mode="random", flip=True,
                     compute_dtype=jnp.float32)
    rng = np.random.default_rng(11)
    images_u8 = jnp.asarray(
        rng.integers(0, 256, (8, 24, 24, 3), dtype=np.uint8))
    labels = jnp.asarray(rng.integers(0, num_classes, (8,)), jnp.int32)
    valid = jnp.ones((8,), bool)
    tw = rng.standard_normal((TINY.embed_dim, num_classes))
    tw = jnp.asarray(tw / np.linalg.norm(tw, axis=0), jnp.float32)
    key = jax.random.key(5)

    # canonical partitioned trainer: unlocked_groups = layers + head group
    mask = build_lock_mask(bundle.params, TINY.vision_layers,
                           TINY.transformer_layers,
                           unlocked_groups=unlocked_layers + 1)
    ref_train, ref_frozen = partition_params(bundle.params, mask)
    opt_r, step_r = make_train_step(bundle.model, cfg, tw, None)
    ref_out, _, ref_m = step_r(ref_train, ref_frozen, opt_r.init(ref_train),
                               images_u8, labels, valid, key, lr)

    opt_p, step_p = make_pipeline_train_step(
        bundle.model, cfg, tw, None, mesh, num_microbatches=2,
        unlocked_layers=unlocked_layers)
    trainable = init_pipeline_trainable(bundle.params, TINY, mesh)
    pp_out, _, pp_m = step_p(trainable, bundle.params, opt_p.init(trainable),
                             images_u8, labels, valid, key, lr)

    np.testing.assert_allclose(float(pp_m["loss"]), float(ref_m["loss"]),
                               atol=1e-5, rtol=1e-5)
    assert int(pp_m["correct"]) == int(ref_m["correct"])

    # Adam normalizes each element by sqrt(v): where the true gradient is
    # ~0, tiny forward-implementation differences flip the +-lr update
    # sign.  So updated TRAINABLE params are compared with Adam-aware
    # bounds (max diff <= 2*lr, and the bulk of elements must agree
    # tightly), while FROZEN layers must stay bit-identical.
    def assert_update_close(got, ref, name):
        diff = np.abs(got - ref)
        assert diff.max() <= 2.05 * lr, (name, diff.max())
        frac_tight = (diff <= 2e-5).mean()
        assert frac_tight >= 0.7, (name, frac_tight)

    flat_ref = {"/".join(k): v for k, v in
                traverse_util.flatten_dict(ref_out).items()}
    orig_blocks = bundle.params["visual"]["transformer"]
    per = TINY.vision_layers // n_stages
    flat_pp = traverse_util.flatten_dict(pp_out["blocks"])
    for path, leaf in flat_pp.items():
        for li in range(TINY.vision_layers):
            got = np.asarray(leaf[li // per, li % per])
            name = "/".join(("visual", "transformer", f"resblocks_{li}")
                            + path)
            if li >= TINY.vision_layers - unlocked_layers:
                assert_update_close(got, np.asarray(flat_ref[name]), name)
                blk = orig_blocks[f"resblocks_{li}"]
                ref_leaf = blk
                for p in path:
                    ref_leaf = ref_leaf[p]
                assert not np.array_equal(got, np.asarray(ref_leaf)), name
            else:  # frozen: bit-identical to the original params
                blk = orig_blocks[f"resblocks_{li}"]
                ref_leaf = blk
                for p in path:
                    ref_leaf = ref_leaf[p]
                assert np.array_equal(got, np.asarray(ref_leaf)), name
    for k, v in traverse_util.flatten_dict(pp_out["head"]).items():
        name = "/".join(("visual",) + k)
        assert_update_close(np.asarray(v), np.asarray(flat_ref[name]), name)


def test_stack_stage_params_shapes(bundle):
    stacked = stack_stage_params(bundle.params, TINY.vision_layers, 2)
    kern = stacked["attn"]["in_proj"]["kernel"]
    assert kern.shape[:2] == (2, 2)          # [stages, layers_per_stage]
    with pytest.raises(ValueError):
        stack_stage_params(bundle.params, TINY.vision_layers, 3)
