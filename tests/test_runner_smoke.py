"""Full-pipeline smoke tests through the CLI-level runner on synthetic data
with the Tiny architecture: inspect-only, ProLIP (openai backend,
cache-write + train + eval), and PEFT (openclip backend)."""

import numpy as np
import pytest

from aihab_clip_tpu.config import ConfigNode
from aihab_clip_tpu.data import make_synthetic_cs_dataset
from aihab_clip_tpu.runner import run


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("runner")
    return make_synthetic_cs_dataset(root, n_train_per_class=5,
                                     n_test_per_class=3, image_size=48)


@pytest.fixture()
def base_cfg(synth, tmp_path):
    return ConfigNode({
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
        "train_epoch": 3,
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
            "eval_l2": True,
            "l2_eval_mode": "argmax",
            "require_cached_features": True,
            "save_model": False,
            "cache_embeddings": False,
        },
        "data": {
            "dataset_paths": synth["dataset_paths"],
            "index_file_names": synth["index_file_names"],
            "batch_size": 8,
            "shuffle": True,
            "num_workers": 0,
            "data_split": {"valid_split": 0.25, "split_seed": 42},
            "use_l2_label": False,
            "preprocessing": {
                "resize": 48,
                "resolution": 32,
                "augmentations": {"bottom_crop": False, "random_crop": True,
                                  "flip": False, "rotation": False},
            },
        },
    })


def test_inspect_only(base_cfg, capsys):
    result = run(base_cfg, inspect_only=True)
    out = capsys.readouterr().out
    assert "Loaded Config" in out
    assert "Text head summary" in out
    assert "Train Batch Sample" in out
    assert "prolip" not in result


def test_prolip_pipeline_with_cache_generation(base_cfg):
    cfg = base_cfg.clone()
    cfg.save_features = True
    result = run(cfg, inspect_only=False)
    out = result["prolip"]
    assert 0.0 <= out["acc"] <= 100.0
    assert out["loss"] is not None
    # cache exists on disk and a second run reuses it (require_cached)
    cfg2 = cfg.clone()
    cfg2.save_features = False
    result2 = run(cfg2, inspect_only=False)
    assert result2["prolip"]["acc"] == pytest.approx(out["acc"], abs=2.0)


def test_prolip_missing_cache_raises(base_cfg):
    cfg = base_cfg.clone()
    cfg.seed = 99  # different cache dir -> missing
    with pytest.raises(FileNotFoundError):
        run(cfg, inspect_only=False)


def test_peft_pipeline(base_cfg, tmp_path):
    cfg = base_cfg.clone()
    cfg.clip_backend = "openclip"
    cfg.open_clip_model = "random:Tiny"
    cfg.train_epoch = 1
    cfg.finetune.unlocked_groups = 1
    cfg.finetune.cache_embeddings = True
    cfg.finetune.cache_embeddings_split = "test"
    cfg.finetune.cache_embeddings_dir = str(tmp_path / "emb")
    cfg.finetune.save_model = True
    cfg.finetune.save_model_dir = str(tmp_path / "ckpt")
    result = run(cfg, inspect_only=False)
    t = result["peft"]["test"]
    assert t is not None and 0.0 <= t["top1"] <= 1.0
    # embedding cache written
    from aihab_clip_tpu.cache import embedding_cache_dir, load_embedding_cache

    cache_dir = embedding_cache_dir(cfg, "test")
    cache = load_embedding_cache(cache_dir)
    assert cache["embeddings"].shape[0] == result["loaders"].test.num_samples
    # checkpoint written
    import os

    assert any(os.scandir(tmp_path / "ckpt"))
