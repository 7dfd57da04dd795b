"""Cache-writer row alignment + multi-host sharded cache wiring through
the runner.

Alignment: the writer must emit every view in deterministic split order so
each ``f{v}.npy`` aligns with the single ``label.npy``.  (The reference
iterates its shuffled train loader per view and keeps only view 0's labels
— `/root/reference/aihab_utils/feature_cache.py:205-224` — a latent
misalignment we fix rather than reproduce.)

Sharding: each process writes ``f{v}.shard{k}.npy`` for its own slice of
the sample space; the reader merges shards in order and ``run_prolip``
consumes the merged cache transparently.
"""

import numpy as np
import pytest

from aihab_clip_tpu.cache import (
    cache_features_from_loader,
    feature_cache_dir,
    feature_cache_exists,
    feature_cache_exists_sharded,
    read_preprojection_cache,
)
from aihab_clip_tpu.config import ConfigNode
from aihab_clip_tpu.data import build_loaders, make_synthetic_cs_dataset
from aihab_clip_tpu.models import load as load_model


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("shardcache")
    return make_synthetic_cs_dataset(root, n_train_per_class=5,
                                     n_test_per_class=2, image_size=48)


def _cfg(synth, tmp_path, **over):
    cfg = ConfigNode({
        "root_path": str(tmp_path),
        "dataset": "synth",
        "seed": 1,
        "shots": 0,
        "subset_l3": [],
        "clip_backend": "openai",
        "backbone": "random:Tiny",
        "wandb_project": None,
        "use_hierarchical_prompts": False,
        "use_descriptive_prompts": False,
        "remat": False,
        "method": "ProLIP",
        "train_epoch": 2,
        "lr_v": 0.001,
        "lambda_v": 0.1,
        "lambda_funct_1_N": False,
        "lambda_funct_1_N2": False,
        "search_lr": False,
        "feat_batch_size": 0,
        "save_checkpoints": False,
        "save_features": False,
        "aug_views": 2,
        "finetune": {
            "enabled": True,
            "tune_text": False,
            "unlocked_groups": 1,
            "unlocked_layers": 1,
            "val_interval": 0,
            "eval_l2": False,
            "require_cached_features": True,
            "save_model": False,
            "cache_embeddings": False,
        },
        "data": {
            "dataset_paths": synth["dataset_paths"],
            "index_file_names": synth["index_file_names"],
            "batch_size": 8,
            "shuffle": True,  # train view shuffles; caching must not
            "num_workers": 0,
            "data_split": {"valid_split": 0.25, "split_seed": 42},
            "use_l2_label": False,
            "preprocessing": {
                "resize": 48,
                "resolution": 32,
                # augmentation off -> the transform is deterministic, so
                # identical rows across views prove deterministic ORDER
                "augmentations": {"bottom_crop": False, "random_crop": False,
                                  "flip": False, "rotation": False},
            },
        },
    })
    for k, v in over.items():
        cfg[k] = v
    return cfg


def test_cache_rows_align_across_views_despite_shuffle(synth, tmp_path):
    cfg = _cfg(synth, tmp_path)
    bundle = load_model("random:Tiny")
    loaders = build_loaders(cfg)
    assert loaders.train.shuffle  # precondition for the regression

    cache_features_from_loader(cfg, bundle.model, bundle.params,
                               loaders.train, 32, loaders.info)
    cache_dir = feature_cache_dir(cfg)
    views, labels = read_preprojection_cache(cache_dir, 2)

    # deterministic order + deterministic transform => identical views
    np.testing.assert_array_equal(np.asarray(views[0]), np.asarray(views[1]))
    # labels are the train split's labels in unshuffled split order
    np.testing.assert_array_equal(
        labels, loaders.train.dataset.labels[loaders.train.indices])


def test_sharded_write_merge_and_prolip_run(synth, tmp_path):
    cfg = _cfg(synth, tmp_path)
    bundle = load_model("random:Tiny")
    loaders = build_loaders(cfg)
    n = loaders.train.num_samples

    for k in range(2):
        cache_features_from_loader(cfg, bundle.model, bundle.params,
                                   loaders.train, 32, loaders.info,
                                   shard_index=k, shard_count=2)

    cache_dir = feature_cache_dir(cfg)
    assert not (cache_dir / "f0.npy").exists()
    assert (cache_dir / "f0.shard0.npy").exists()
    assert (cache_dir / "f1.shard1.npy").exists()
    assert not feature_cache_exists(cache_dir, 2)          # single-file: no
    assert feature_cache_exists_sharded(cache_dir, 2)      # sharded: yes

    views, labels = read_preprojection_cache(cache_dir, 2)
    assert labels.shape[0] == n
    assert views[0].shape[0] == n
    # the two shards partition the split's label multiset exactly
    expect = loaders.train.dataset.labels[loaders.train.indices]
    np.testing.assert_array_equal(np.sort(labels), np.sort(expect))

    # the runner consumes the merged sharded cache transparently
    from aihab_clip_tpu.runner import run

    result = run(cfg, inspect_only=False)
    assert 0.0 <= result["prolip"]["acc"] <= 100.0


def test_runner_cfg_shard_overrides(synth, tmp_path):
    """cache_shard_index/count config keys drive sharded writes through
    the top-level run() (one shard per invocation, as on a real pod)."""
    from aihab_clip_tpu.runner import run

    cfg = _cfg(synth, tmp_path, save_features=True, aug_views=1)
    cfg["cache_shard_count"] = 2
    cfg["cache_shard_index"] = 0
    cfg.finetune["require_cached_features"] = True
    # shard 0 alone is not a complete cache -> run writes it, then the
    # ProLIP read still succeeds (reader concatenates available shards);
    # to keep the semantics strict we write shard 1 first so the merged
    # cache is complete when ProLIP reads it.
    cfg1 = cfg.clone()
    cfg1["cache_shard_index"] = 1
    bundle = load_model("random:Tiny")
    loaders = build_loaders(cfg1)
    cache_features_from_loader(cfg1, bundle.model, bundle.params,
                               loaders.train, 32, loaders.info,
                               shard_index=1, shard_count=2)

    result = run(cfg, inspect_only=False)
    cache_dir = feature_cache_dir(cfg)
    assert (cache_dir / "f0.shard0.npy").exists()
    assert (cache_dir / "f0.shard1.npy").exists()
    assert 0.0 <= result["prolip"]["acc"] <= 100.0
