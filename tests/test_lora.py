"""LoRA adapter PEFT (beyond-reference method, train/lora.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from aihab_clip_tpu.config import ConfigNode
from aihab_clip_tpu.data import build_loaders, make_synthetic_cs_dataset
from aihab_clip_tpu.models import CLIPConfig, build_text_head, load
from aihab_clip_tpu.templates import gen_prompts
from aihab_clip_tpu.train.lora import (
    lora_init,
    lora_merge,
    lora_param_count,
    lora_target_paths,
)
from aihab_clip_tpu.train.peft import PEFTConfig, finetune

TINY = CLIPConfig(
    embed_dim=32, image_resolution=24, vision_layers=3, vision_width=64,
    vision_patch_size=8, context_length=77, vocab_size=49408,
    transformer_width=64, transformer_heads=1, transformer_layers=2)


@pytest.fixture(scope="module")
def bundle():
    return load("random:tiny-lora", random_cfg=TINY, seed=1)


@pytest.fixture(scope="module")
def siglip_bundle():
    return load("random:SigLIP-Tiny", seed=1)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("lora")
    synth = make_synthetic_cs_dataset(root, n_train_per_class=6,
                                      n_test_per_class=3, image_size=32)
    cfg = ConfigNode({
        "seed": 1, "shots": 0, "subset_l3": [],
        "data": {
            "dataset_paths": synth["dataset_paths"],
            "index_file_names": synth["index_file_names"],
            "batch_size": 8, "shuffle": True, "num_workers": 0,
            "data_split": {"valid_split": 0.25, "split_seed": 42},
            "preprocessing": {"resize": 32, "resolution": 24},
        },
    })
    return build_loaders(cfg)


def test_target_paths_clip_and_siglip(bundle, siglip_bundle):
    clip_paths = lora_target_paths(bundle.params)
    # CLIP layout: packed in_proj + out_proj per block
    assert ("visual", "transformer", "resblocks_0", "attn", "in_proj",
            "kernel") in clip_paths
    assert len(clip_paths) == 2 * TINY.vision_layers

    sig_paths = lora_target_paths(siglip_bundle.params)
    # SigLIP layout: separate q/k/v/out per block
    assert ("visual", "transformer", "resblocks_0", "attn", "q_proj",
            "kernel") in sig_paths
    assert len(sig_paths) == 4 * siglip_bundle.config.vision_layers

    both = lora_target_paths(siglip_bundle.params,
                             towers=("visual", "text"), include_mlp=True)
    assert any(p[0] == "text" for p in both)
    assert any(p[-2] == "c_fc" for p in both)


def test_zero_init_delta_is_identity(bundle):
    adapters = lora_init(bundle.params, 4, jax.random.key(0))
    assert lora_param_count(adapters) > 0
    merged = lora_merge(bundle.params, adapters, alpha=16.0)
    fa = traverse_util.flatten_dict(bundle.params)
    fb = traverse_util.flatten_dict(merged)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg="/".join(k))


def test_merge_changes_only_targets(bundle):
    adapters = lora_init(bundle.params, 4, jax.random.key(0))
    # perturb B so deltas are nonzero
    adapters = jax.tree.map(lambda t: t + 0.01, adapters)
    merged = lora_merge(bundle.params, adapters, alpha=16.0)
    targets = set(lora_target_paths(bundle.params))
    fa = traverse_util.flatten_dict(bundle.params)
    fb = traverse_util.flatten_dict(merged)
    for k in fa:
        same = np.array_equal(np.asarray(fa[k]), np.asarray(fb[k]))
        assert same != (k in targets), "/".join(k)


@pytest.mark.slow
def test_lora_finetune_improves_and_trains_only_adapters(bundle, data):
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    head = build_text_head(bundle.model, bundle.params, prompts, 20, tpc)
    cfg = PEFTConfig(resolution=24, num_classes=20, lr=5e-3, epochs=3,
                     crop_mode="center", tune_text=False, lora_rank=4,
                     lora_mlp=True)
    out = finetune(
        bundle.model, bundle.params, data.train, None, data.test, cfg,
        text_weights=head["text_weights"], unlocked_groups=0, seed=0,
        verbose=False)
    assert out["report"]["method"] == "lora"
    assert out["test"] is not None
    # color-separable fixture: LoRA must learn it
    assert out["test"]["top1"] > 0.5
    # returned params: only target kernels moved
    targets = set(lora_target_paths(bundle.params, include_mlp=True))
    fa = traverse_util.flatten_dict(bundle.params)
    fb = traverse_util.flatten_dict(out["params"])
    changed = {k for k in fa
               if not np.array_equal(np.asarray(fa[k]), np.asarray(fb[k]))}
    assert changed and changed <= targets


@pytest.mark.slow
def test_lora_siglip_with_scan_and_tune_text(siglip_bundle, data):
    """LoRA composes with scan_blocks and tune_text on the SigLIP tower."""
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    head = build_text_head(siglip_bundle.model, siglip_bundle.params,
                           prompts, 20, tpc)
    cfg = PEFTConfig(resolution=32, num_classes=20, lr=5e-3, epochs=2,
                     crop_mode="center", tune_text=True, num_templates=tpc,
                     lora_rank=4, scan_blocks=True)
    out = finetune(
        siglip_bundle.model, siglip_bundle.params, data.train, None,
        data.test, cfg, prompt_tokens=jnp.asarray(head["prompt_tokens"]),
        unlocked_groups=0, seed=0, verbose=False)
    assert out["test"] is not None and out["test"]["top1"] > 0.3
    targets = set(lora_target_paths(siglip_bundle.params,
                                    towers=("visual", "text")))
    fa = traverse_util.flatten_dict(siglip_bundle.params)
    fb = traverse_util.flatten_dict(out["params"])
    changed = {k for k in fa
               if not np.array_equal(np.asarray(fa[k]), np.asarray(fb[k]))}
    assert changed and changed <= targets
    assert any(k[0] == "text" for k in changed)


def test_lora_rejects_resume(bundle, data):
    cfg = PEFTConfig(resolution=24, num_classes=20, lr=1e-3, epochs=1,
                     lora_rank=2)
    with pytest.raises(ValueError, match="resume"):
        finetune(bundle.model, bundle.params, data.train, None, None, cfg,
                 text_weights=jnp.zeros((32, 20)), resume_from="/tmp/x",
                 verbose=False)


@pytest.mark.slow
def test_lora_epoch_scan_matches_per_step(bundle, data):
    """LoRA trains step-for-step identically through the per-step loop
    and the device_dataset epoch scan (same batch order + aug keys)."""
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    head = build_text_head(bundle.model, bundle.params, prompts, 20, tpc)
    base = dict(resolution=24, num_classes=20, lr=5e-3, epochs=2,
                crop_mode="center", tune_text=False, lora_rank=4)
    kw = dict(text_weights=head["text_weights"], unlocked_groups=0, seed=0,
              verbose=False)
    out_a = finetune(bundle.model, bundle.params, data.train, None, None,
                     PEFTConfig(device_dataset=False, **base), **kw)
    out_b = finetune(bundle.model, bundle.params, data.train, None, None,
                     PEFTConfig(device_dataset=True, **base), **kw)
    fa = traverse_util.flatten_dict(out_a["adapters"])
    fb = traverse_util.flatten_dict(out_b["adapters"])
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(np.asarray(fa[k]), np.asarray(fb[k]),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg="/".join(k))


@pytest.mark.slow
def test_lora_step_under_dp_mesh(siglip_bundle, data):
    """LoRA composes with a pure-DP mesh: adapters replicate, the step
    runs, only adapters update."""
    import jax as _jax

    from aihab_clip_tpu.parallel import make_mesh, shard_batch
    from aihab_clip_tpu.train.peft import make_train_step, _merge_for_step

    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    head = build_text_head(siglip_bundle.model, siglip_bundle.params,
                           prompts, 20, tpc)
    mesh = make_mesh()
    res = siglip_bundle.config.image_resolution
    cfg = PEFTConfig(resolution=res, num_classes=20, lr=5e-3, epochs=1,
                     crop_mode="center", lora_rank=2)
    with _jax.set_mesh(mesh):
        out = finetune(
            siglip_bundle.model, siglip_bundle.params, data.train, None,
            data.test, cfg, text_weights=head["text_weights"],
            unlocked_groups=0, seed=0, verbose=False, mesh=mesh)
    assert out["adapters"] is not None
    assert out["test"] is not None
    targets = set(lora_target_paths(siglip_bundle.params))
    fa = traverse_util.flatten_dict(siglip_bundle.params)
    fb = traverse_util.flatten_dict(out["params"])
    changed = {k for k in fa
               if not np.array_equal(np.asarray(fa[k]), np.asarray(fb[k]))}
    assert changed and changed <= targets
