"""Local sweep grid driver: yaml expansion + an end-to-end 2-combo run."""

import yaml

from aihab_clip_tpu.tools.run_grid import expand_grid, run_grid


def test_expand_grid():
    sweep = {"parameters": {
        "lr_v": {"values": [1e-3, 1e-4]},
        "seed": {"values": [1, 2, 3]},
        "train_epoch": {"value": 5},
    }}
    combos = expand_grid(sweep)
    assert len(combos) == 6
    assert all(c["train_epoch"] == 5 for c in combos)
    assert {c["lr_v"] for c in combos} == {1e-3, 1e-4}


def test_expand_repo_sweep_yaml():
    sweep = yaml.safe_load(open("sweeps/openclip_ft.yaml"))
    combos = expand_grid(sweep)
    assert len(combos) == 5 * 5  # unlocked_layers x seeds
    assert "finetune.unlocked_layers" in combos[0]


def test_run_grid_end_to_end(tmp_path):
    from aihab_clip_tpu.data import make_synthetic_cs_dataset

    synth = make_synthetic_cs_dataset(tmp_path, n_train_per_class=4,
                                      n_test_per_class=2, image_size=40)
    base = tmp_path / "base.yaml"
    base.write_text(f"""
root_path: '{tmp_path}'
dataset: 'synth'
seed: 1
shots: 0
subset_l3: []
clip_backend: 'openclip'
open_clip_model: 'random:Tiny'
backbone: 'random:Tiny'
use_model_preprocess: false
use_hierarchical_prompts: false
use_descriptive_prompts: false
wandb_project: null
remat: false
train_epoch: 1
lr_v: 0.001
lambda_v: 0.1
lambda_funct_1_N: false
lambda_funct_1_N2: false
search_lr: false
feat_batch_size: 0
save_checkpoints: false
save_features: false
aug_views: 1
aug_impl: 'fast'
finetune:
  enabled: true
  tune_text: false
  unlocked_groups: 1
  unlocked_layers: 1
  val_interval: 0
  eval_l2: false
  eval_only: false
  checkpoint: null
  require_cached_features: true
  save_model: false
  cache_embeddings: false
data:
  dataset_paths: ['{synth["train_dir"]}']
  index_file_names: ['index.csv']
  batch_size: 8
  shuffle: true
  num_workers: 0
  data_split: {{valid_split: 0.25, split_seed: 42}}
  use_l2_label: false
  preprocessing:
    resize: 40
    resolution: 32
    augmentations: {{random_crop: false}}
""")
    sweep = tmp_path / "sweep.yaml"
    sweep.write_text("""
metric: {name: top1_acc, goal: maximize}
parameters:
  lr_v: {values: [0.001, 0.0001]}
""")
    out = tmp_path / "results.csv"
    rows = run_grid(str(sweep), str(base), str(base), out_csv=str(out))
    assert len(rows) == 2
    assert all("top1_acc" in r for r in rows)
    import pandas as pd

    df = pd.read_csv(out)
    assert len(df) == 2
    # sorted by the metric, maximizing
    assert df.iloc[0]["top1_acc"] >= df.iloc[1]["top1_acc"]


def test_run_grid_dry_run(tmp_path):
    sweep = tmp_path / "s.yaml"
    sweep.write_text("parameters: {seed: {values: [1, 2]}}")
    rows = run_grid(str(sweep), "configs/base.yaml",
                    "configs/synthetic_smoke.yaml", dry_run=True,
                    out_csv=str(tmp_path / "r.csv"))
    assert len(rows) == 2
