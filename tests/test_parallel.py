"""Sharded execution on the 8-device virtual CPU mesh: data-parallel and
data x tensor parallel runs of the real PEFT train step and encoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from aihab_clip_tpu.models import CLIPConfig, build_text_head, load
from aihab_clip_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
    shard_params,
)
from aihab_clip_tpu.templates import gen_prompts
from aihab_clip_tpu.train.peft import (
    PEFTConfig,
    build_lock_mask,
    make_train_step,
    partition_params,
)

TINY = CLIPConfig(
    embed_dim=32, image_resolution=16, vision_layers=2, vision_width=128,
    vision_patch_size=8, context_length=77, vocab_size=49408,
    transformer_width=128, transformer_heads=2, transformer_layers=2)


@pytest.fixture(scope="module")
def bundle():
    return load("random:tiny-par", random_cfg=TINY, seed=0)


@pytest.fixture(scope="module")
def head(bundle):
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    return build_text_head(bundle.model, bundle.params, prompts, 20, tpc)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {DATA_AXIS: 8, MODEL_AXIS: 1}
    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        make_mesh(model_parallel=3)


def test_param_shardings_rules(bundle):
    mesh = make_mesh(model_parallel=2)
    sh = param_shardings(mesh, bundle.params)
    blk = sh["visual"]["transformer"]["resblocks_0"]
    assert blk["attn"]["in_proj"]["kernel"].spec == P(None, MODEL_AXIS)
    assert blk["attn"]["out_proj"]["kernel"].spec == P(MODEL_AXIS, None)
    assert blk["mlp"]["c_fc"]["kernel"].spec == P(None, MODEL_AXIS)
    assert blk["mlp"]["c_proj"]["kernel"].spec == P(MODEL_AXIS, None)
    # replicated elsewhere
    assert sh["visual"]["conv1"]["kernel"].spec == P()
    # dp-only mesh -> everything replicated
    sh_dp = param_shardings(make_mesh(), bundle.params)
    assert sh_dp["visual"]["transformer"]["resblocks_0"]["mlp"]["c_fc"]["kernel"].spec == P()


def _run_step(bundle, head, mesh, model_parallel):
    params = shard_params(mesh, bundle.params)
    mask = build_lock_mask(params, TINY.vision_layers, TINY.transformer_layers,
                           unlocked_groups=2, tune_text=False)
    trainable, frozen = partition_params(params, mask)

    cfg = PEFTConfig(resolution=16, num_classes=20, lr=1e-3, epochs=1,
                     crop_mode="center")
    opt, step = make_train_step(bundle.model, cfg,
                                jnp.asarray(head["text_weights"]), None)
    opt_state = opt.init(trainable)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(16, 24, 24, 3), dtype=np.uint8)
    labels = rng.integers(0, 20, size=16).astype(np.int32)
    valid = np.ones(16, bool)
    images, labels, valid = shard_batch(mesh, images, labels, valid)

    trainable, opt_state, m = step(trainable, frozen, opt_state, images,
                                   labels, valid, jax.random.key(0), 1e-3)
    return float(m["loss"]), trainable


def test_dp8_step_runs_and_matches_single_device(bundle, head):
    mesh = make_mesh()
    with jax.set_mesh(mesh):
        loss_dp, _ = _run_step(bundle, head, mesh, 1)
    assert np.isfinite(loss_dp)


def test_dp4_tp2_step_runs(bundle, head):
    mesh = make_mesh(model_parallel=2)
    with jax.set_mesh(mesh):
        loss_tp, _ = _run_step(bundle, head, mesh, 2)
    assert np.isfinite(loss_tp)


def test_dp_and_tp_agree(bundle, head):
    mesh_dp = make_mesh()
    with jax.set_mesh(mesh_dp):
        loss_dp, tr_dp = _run_step(bundle, head, mesh_dp, 1)
    mesh_tp = make_mesh(model_parallel=2)
    with jax.set_mesh(mesh_tp):
        loss_tp, tr_tp = _run_step(bundle, head, mesh_tp, 2)
    assert loss_dp == pytest.approx(loss_tp, rel=1e-4)
    a = np.asarray(jax.tree_util.tree_leaves(tr_dp)[0])
    b = np.asarray(jax.tree_util.tree_leaves(tr_tp)[0])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fsdp_pspec_rules(bundle):
    # pure-DP mesh + fsdp: largest divisible dim sharded over data
    sh = param_shardings(make_mesh(), bundle.params, fsdp=True)
    blk = sh["visual"]["transformer"]["resblocks_0"]
    assert blk["mlp"]["c_fc"]["kernel"].spec == P(None, DATA_AXIS)  # [128, 512]
    assert blk["mlp"]["c_fc"]["bias"].spec == P(DATA_AXIS)          # [512]
    assert sh["visual"]["conv1"]["kernel"].spec == P(
        None, None, None, DATA_AXIS)                                # [8,8,3,128]
    # composes with TP: the TP-free dim picks up the data axis
    sh2 = param_shardings(make_mesh(model_parallel=2), bundle.params,
                          fsdp=True)
    blk2 = sh2["visual"]["transformer"]["resblocks_0"]
    assert blk2["mlp"]["c_fc"]["kernel"].spec == P(DATA_AXIS, MODEL_AXIS)
    assert blk2["mlp"]["c_proj"]["kernel"].spec == P(MODEL_AXIS, DATA_AXIS)


def test_fsdp_step_matches_dp(bundle, head):
    """FSDP-sharded params + Adam moments produce the same step as pure
    DP, with the weights (and moments) actually distributed."""
    mesh = make_mesh()
    with jax.set_mesh(mesh):
        loss_dp, tr_dp = _run_step(bundle, head, mesh, 1)

    with jax.set_mesh(mesh):
        params = shard_params(mesh, bundle.params, fsdp=True)
        mask = build_lock_mask(params, TINY.vision_layers,
                               TINY.transformer_layers,
                               unlocked_groups=2, tune_text=False)
        trainable, frozen = partition_params(params, mask)
        cfg = PEFTConfig(resolution=16, num_classes=20, lr=1e-3, epochs=1,
                         crop_mode="center")
        opt, step = make_train_step(bundle.model, cfg,
                                    jnp.asarray(head["text_weights"]), None)
        opt_state = opt.init(trainable)

        # params and moments are genuinely sharded (1/8 per device)
        cfck = trainable["visual"]["transformer"]["resblocks_1"]["mlp"][
            "c_fc"]["kernel"]
        assert cfck.addressable_shards[0].data.shape == (128, 512 // 8)
        mu = jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: hasattr(x, "addressable_shards"))
        mu_cfck = [l for l in mu if getattr(l, "shape", None) == (128, 512)]
        assert mu_cfck and all(
            l.addressable_shards[0].data.shape == (128, 512 // 8)
            for l in mu_cfck)

        rng = np.random.default_rng(0)
        images = rng.integers(0, 256, size=(16, 24, 24, 3), dtype=np.uint8)
        labels = rng.integers(0, 20, size=16).astype(np.int32)
        valid = np.ones(16, bool)
        images, labels, valid = shard_batch(mesh, images, labels, valid)
        trainable, opt_state, m = step(trainable, frozen, opt_state, images,
                                       labels, valid, jax.random.key(0), 1e-3)

    assert float(m["loss"]) == pytest.approx(loss_dp, rel=1e-4)
    a = np.asarray(jax.tree_util.tree_leaves(tr_dp)[0])
    b = np.asarray(jax.tree_util.tree_leaves(trainable)[0])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fsdp_checkpoint_roundtrip(bundle, tmp_path):
    """Orbax checkpointing round-trips FSDP-sharded param trees: save
    from sharded arrays, restore, values equal the originals."""
    from aihab_clip_tpu.config import ConfigNode
    from aihab_clip_tpu.utils import load_checkpoint, save_checkpoint

    mesh = make_mesh()
    with jax.set_mesh(mesh):
        sharded = shard_params(mesh, bundle.params, fsdp=True)
        cfg = ConfigNode({"backbone": "random:tiny-par", "dataset": "synth",
                          "finetune": {"save_model_dir":
                                       str(tmp_path / "ck")}})
        path = save_checkpoint(cfg, sharded, None, epoch=1)
    restored = load_checkpoint(path, bundle.params, None)
    for (ka, a), (kb, b) in zip(
            sorted(_flat(bundle.params).items()),
            sorted(_flat(restored["params"]).items())):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=ka)


def _flat(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat(v, prefix + "/" + k))
    else:
        out[prefix] = tree
    return out


def test_sharded_encode_image(bundle):
    mesh = make_mesh()
    params = shard_params(mesh, bundle.params)
    x = np.random.default_rng(0).standard_normal((8, 16, 16, 3)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))

    @jax.jit
    def encode(p, x):
        return bundle.model.apply({"params": p}, x,
                                  method=type(bundle.model).encode_image)

    with jax.set_mesh(mesh):
        out = encode(params, xs)
    assert out.shape == (8, TINY.vision_width)
    # matches unsharded execution
    ref = bundle.model.apply({"params": bundle.params}, jnp.asarray(x),
                             method=type(bundle.model).encode_image)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.slow
def test_runner_peft_spmd_dp8(tmp_path):
    """Full runner PEFT under the virtual 8-device mesh (auto-enabled) —
    DP8 and DP4xTP2 both train and evaluate through run()."""
    from aihab_clip_tpu.config import ConfigNode
    from aihab_clip_tpu.data import make_synthetic_cs_dataset
    from aihab_clip_tpu.runner import run

    synth = make_synthetic_cs_dataset(tmp_path, n_train_per_class=4,
                                      n_test_per_class=2, image_size=40)

    def cfg(model_parallel, fsdp=False):
        return ConfigNode({
            "root_path": str(tmp_path), "dataset": "synth", "seed": 1,
            "shots": 0, "subset_l3": [],
            "clip_backend": "openclip", "open_clip_model": "random:Tiny",
            "backbone": "random:Tiny", "wandb_project": None,
            "use_hierarchical_prompts": False,
            "use_descriptive_prompts": False, "remat": False,
            "train_epoch": 1, "lr_v": 0.002, "search_lr": False,
            "save_features": False, "aug_views": 1,
            "parallel": {"enabled": True, "model_parallel": model_parallel,
                         "fsdp": fsdp},
            "finetune": {
                "enabled": True, "tune_text": False, "unlocked_groups": 1,
                "unlocked_layers": 1, "val_interval": 0, "eval_l2": False,
                "require_cached_features": True, "save_model": False,
                "cache_embeddings": False,
            },
            "data": {
                "dataset_paths": synth["dataset_paths"],
                "index_file_names": synth["index_file_names"],
                "batch_size": 8, "shuffle": True, "num_workers": 0,
                "data_split": {"valid_split": 0.25, "split_seed": 42},
                "use_l2_label": False,
                "preprocessing": {"resize": 40, "resolution": 32,
                                  "augmentations": {"random_crop": False}},
            },
        })

    r_dp = run(cfg(1), inspect_only=False)
    t_dp = r_dp["peft"]["test"]
    assert t_dp is not None and 0.0 <= t_dp["top1"] <= 1.0

    r_tp = run(cfg(2), inspect_only=False)
    t_tp = r_tp["peft"]["test"]
    # same data, same seed: DP8 and DP4xTP2 agree on the outcome
    assert t_tp["top1"] == pytest.approx(t_dp["top1"], abs=1e-6)
    assert t_tp["loss"] == pytest.approx(t_dp["loss"], rel=1e-3)

    r_fsdp = run(cfg(1, fsdp=True), inspect_only=False)
    t_fsdp = r_fsdp["peft"]["test"]
    assert t_fsdp["top1"] == pytest.approx(t_dp["top1"], abs=1e-6)
    assert t_fsdp["loss"] == pytest.approx(t_dp["loss"], rel=1e-3)


@pytest.mark.slow
def test_siglip_tp_rules_and_sharded_encode():
    """SigLIP's separate q/k/v projections get column-parallel placement
    and the sharded tower matches unsharded execution (DP and DP4xTP2)."""
    b = load("random:SigLIP-Tiny", seed=5)
    mesh = make_mesh(model_parallel=2)
    sh = param_shardings(mesh, b.params)
    blk = sh["visual"]["transformer"]["resblocks_0"]
    for name in ("q_proj", "k_proj", "v_proj"):
        assert blk["attn"][name]["kernel"].spec == P(None, MODEL_AXIS)
        assert blk["attn"][name]["bias"].spec == P(MODEL_AXIS)
    assert blk["attn"]["out_proj"]["kernel"].spec == P(MODEL_AXIS, None)
    assert blk["mlp"]["c_fc"]["kernel"].spec == P(None, MODEL_AXIS)

    x = np.random.default_rng(0).standard_normal((8, 32, 32, 3)).astype(
        np.float32)
    ref = np.asarray(b.model.apply({"params": b.params}, jnp.asarray(x),
                                   method=type(b.model).encode_image))

    @jax.jit
    def encode(p, xs):
        return b.model.apply({"params": p}, xs,
                             method=type(b.model).encode_image)

    for mp in (1, 2):
        mesh = make_mesh(model_parallel=mp)
        params = shard_params(mesh, b.params)
        xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
        with jax.set_mesh(mesh):
            out = np.asarray(encode(params, xs))
        np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.slow
def test_dp8_fused_prefix_hybrid_step_matches_single_device(bundle, head):
    """The frozen-prefix fused hybrid inside the train step composes with
    a pure-DP mesh (prefix shard_mapped over `data`, interpret-mode
    Pallas; suffix GSPMD): the step runs, and its loss and gradients
    match the single-device hybrid step.  (Post-Adam trainables are NOT
    compared: the first Adam update is ~sign(grad)*lr, which amplifies
    reduction-order noise on near-zero gradients into full sign flips.)"""
    from flax import traverse_util

    from aihab_clip_tpu.train.peft import _encode_projected, merge_params

    tw = jnp.asarray(head["text_weights"])
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(16, 24, 24, 3), dtype=np.uint8)
    labels = rng.integers(0, 20, size=16).astype(np.int32)
    valid = np.ones(16, bool)
    cfg = PEFTConfig(resolution=16, num_classes=20, lr=1e-3, epochs=1,
                     crop_mode="center", fused_prefix=1)
    mask = build_lock_mask(bundle.params, TINY.vision_layers,
                           TINY.transformer_layers, unlocked_groups=2)

    def run_step(mesh):
        params = bundle.params if mesh is None else shard_params(
            mesh, bundle.params)
        trainable, frozen = partition_params(params, mask)
        opt, step = make_train_step(bundle.model, cfg, tw, None, mesh=mesh)
        opt_state = opt.init(trainable)
        b = (images, labels, valid)
        if mesh is not None:
            b = shard_batch(mesh, *b)
        trainable, _, m = step(trainable, frozen, opt_state, *b,
                               jax.random.key(0), 1e-3)
        return float(m["loss"])

    def run_grads(mesh):
        params = bundle.params if mesh is None else shard_params(
            mesh, bundle.params)
        trainable, frozen = partition_params(params, mask)
        x = jnp.asarray(images, jnp.float32) / 255.0
        x = x[:, 4:20, 4:20, :]  # static 16x16 crop
        if mesh is not None:
            x = jax.device_put(x, batch_sharding(mesh))

        def loss_fn(tr):
            par = merge_params(tr, frozen)
            _, feats = _encode_projected(bundle.model, cfg, par, x,
                                         mesh=mesh)
            return jnp.sum(jnp.sin(feats.astype(jnp.float32)))

        return traverse_util.flatten_dict(jax.jit(jax.grad(loss_fn))(
            trainable))

    loss_ref = run_step(None)
    g_ref = run_grads(None)
    mesh = make_mesh()
    with jax.set_mesh(mesh):
        loss_dp = run_step(mesh)
        g_dp = run_grads(mesh)
    assert loss_dp == pytest.approx(loss_ref, rel=1e-5)
    assert set(g_ref) == set(g_dp)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_dp[k]), np.asarray(g_ref[k]),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg="/".join(map(str, k)))
    # frozen-prefix leaves must not appear among the trainables at all
    assert not any(k[:3] == ("visual", "transformer", "resblocks_0")
                   for k in g_ref)


@pytest.mark.slow
def test_dp8_int8_prefix_hybrid_grads_match_single_device(bundle, head):
    """The int8 frozen prefix (qprefix) composes with a pure-DP mesh: the
    shard_mapped prefix broadcasts the quantized pytree (in_specs P()),
    and suffix grads match the single-device int8-hybrid grads."""
    from flax import traverse_util

    from aihab_clip_tpu.models.quant_vit import quantize_vit_block
    from aihab_clip_tpu.train.peft import _encode_projected, merge_params

    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, size=(16, 24, 24, 3), dtype=np.uint8)
    cfg = PEFTConfig(resolution=16, num_classes=20, lr=1e-3, epochs=1,
                     crop_mode="center", fused_prefix=1, prefix_quant=True)
    mask = build_lock_mask(bundle.params, TINY.vision_layers,
                           TINY.transformer_layers, unlocked_groups=2)

    def run_grads(mesh):
        params = bundle.params if mesh is None else shard_params(
            mesh, bundle.params)
        trainable, frozen = partition_params(params, mask)
        qprefix = {"resblocks_0": quantize_vit_block(
            frozen["visual"]["transformer"]["resblocks_0"])}
        x = jnp.asarray(images, jnp.float32) / 255.0
        x = x[:, 4:20, 4:20, :]  # static 16x16 crop
        if mesh is not None:
            x = jax.device_put(x, batch_sharding(mesh))

        def loss_fn(tr):
            par = merge_params(tr, frozen)
            _, feats = _encode_projected(bundle.model, cfg, par, x,
                                         mesh=mesh, qprefix=qprefix)
            return jnp.sum(jnp.sin(feats.astype(jnp.float32)))

        return traverse_util.flatten_dict(jax.jit(jax.grad(loss_fn))(
            trainable))

    g_ref = run_grads(None)
    mesh = make_mesh()
    with jax.set_mesh(mesh):
        g_dp = run_grads(mesh)
    assert set(g_ref) == set(g_dp)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_dp[k]), np.asarray(g_ref[k]),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg="/".join(map(str, k)))
    assert not any(k[:3] == ("visual", "transformer", "resblocks_0")
                   for k in g_ref)


@pytest.mark.slow
def test_scan_blocks_step_matches_canonical_under_mesh():
    """finetune.scan_blocks composes with a pure-DP mesh (and FSDP): the
    scanned SigLIP step produces the canonical step's loss and params —
    GSPMD partitions the in-jit stack -> lax.scan chain like any other
    jnp program."""
    sl_bundle = load("random:SigLIP-Tiny", seed=0)
    cfg_m = sl_bundle.config
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    sl_head = build_text_head(sl_bundle.model, sl_bundle.params, prompts,
                              20, tpc)
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    res = cfg_m.image_resolution
    images = rng.integers(0, 256, size=(16, res, res, 3), dtype=np.uint8)
    labels = rng.integers(0, 20, size=16).astype(np.int32)
    valid = np.ones(16, bool)

    results = {}
    for name, kw in [("canonical", {}), ("scan", {"scan_blocks": True}),
                     ("scan_fsdp", {"scan_blocks": True})]:
        fsdp = name.endswith("fsdp")
        with jax.set_mesh(mesh):
            params = shard_params(mesh, sl_bundle.params, fsdp=fsdp)
            mask = build_lock_mask(params, cfg_m.vision_layers,
                                   cfg_m.transformer_layers,
                                   unlocked_groups=2, tune_text=False)
            trainable, frozen = partition_params(params, mask)
            cfg = PEFTConfig(resolution=res, num_classes=20, lr=1e-3,
                             epochs=1, crop_mode="center", fused_prefix=0,
                             **kw)
            opt, step = make_train_step(
                sl_bundle.model, cfg, jnp.asarray(sl_head["text_weights"]),
                None, mesh=mesh)
            opt_state = opt.init(trainable)
            imgs, labs, val = shard_batch(mesh, images, labels, valid)
            trainable, opt_state, m = step(
                trainable, frozen, opt_state, imgs, labs, val,
                jax.random.key(0), 1e-3)
            results[name] = (float(m["loss"]),
                             np.asarray(jax.tree_util.tree_leaves(
                                 trainable)[0]))

    for name in ("scan", "scan_fsdp"):
        assert results[name][0] == pytest.approx(results["canonical"][0],
                                                 rel=1e-4), name
        # post-update params: Adam's first step is ~lr*sign(g), so
        # f32 reduction-order noise in near-zero grads (random labels)
        # can flip an update's sign — bound by the step size (2*lr),
        # which still catches structural errors (those fail the loss
        # assert above / the strict single-device parity tests)
        np.testing.assert_allclose(results[name][1],
                                   results["canonical"][1], atol=2.1e-3)


def test_fsdp_eval_scan_blocks_matches_canonical():
    """FSDP eval with scan_blocks produces the canonical eval metrics."""
    from aihab_clip_tpu.ops.metrics import init_metric_state
    from aihab_clip_tpu.train.evaluate import make_eval_step

    sl_bundle = load("random:SigLIP-Tiny", seed=0)
    cfg_m = sl_bundle.config
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    sl_head = build_text_head(sl_bundle.model, sl_bundle.params, prompts,
                              20, tpc)
    mesh = make_mesh()
    rng = np.random.default_rng(3)
    res = cfg_m.image_resolution
    images = rng.integers(0, 256, size=(16, res, res, 3), dtype=np.uint8)
    targets = rng.integers(0, 20, size=16).astype(np.int32)
    valid = np.ones(16, bool)

    outs = {}
    for name, sb in [("canonical", False), ("scan", True)]:
        with jax.set_mesh(mesh):
            params = shard_params(mesh, sl_bundle.params, fsdp=True)
            step = make_eval_step(sl_bundle.model, res, 20,
                                  jnp.float32, mesh=mesh,
                                  sharded_weights=True, scan_blocks=sb)
            state = init_metric_state(20)
            imgs, tgt, val = shard_batch(mesh, images, targets, valid)
            state, logits = step(params, jnp.asarray(
                sl_head["text_weights"]), imgs, tgt, val, state)
            outs[name] = np.asarray(logits)
    np.testing.assert_allclose(outs["scan"], outs["canonical"],
                               atol=2e-4, rtol=2e-4)
