"""W&B sweep-agent integration: a fake wandb module stands in for the real
service and the launcher is driven exactly the way ``wandb agent`` drives
it (``--key=value`` override args).  Verifies the full agent path: project
suffixing, run naming, config capture, scalar logs, CM image logging, and
run finish — with zero network.

Reference counterpart: `/root/reference/tools/run_ft_sweep.py:133-151`
(wandb.init with `_sweep`-suffixed project + composed run name).
"""

import sys
import types

import pytest


class _FakeRun:
    def __init__(self, project, name, config):
        self.project = project
        self.name = name
        self.config = config
        self.logged = []
        self.finished = False

    def log(self, payload):
        self.logged.append(payload)

    def finish(self):
        self.finished = True


def _make_fake_wandb(record):
    fake = types.ModuleType("wandb")

    def init(project=None, name=None, config=None, **kw):
        run = _FakeRun(project, name, config)
        record.append(run)
        return run

    fake.init = init
    fake.Table = lambda dataframe=None: ("table", dataframe)
    fake.Image = lambda fig=None: ("image",)
    return fake


@pytest.fixture()
def fake_wandb(monkeypatch):
    record = []
    fake = _make_fake_wandb(record)
    import aihab_clip_tpu.utils.logging as logmod

    monkeypatch.setattr(logmod, "wandb", fake)
    monkeypatch.setattr(logmod, "_HAS_WANDB", True)
    return record


def _write_base_yaml(tmp_path, synth):
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
wandb_project: 'aihab'
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
    return base


@pytest.mark.slow
def test_agent_style_invocation_logs_to_wandb(fake_wandb, tmp_path,
                                              monkeypatch):
    from aihab_clip_tpu.data import make_synthetic_cs_dataset
    from aihab_clip_tpu.tools import run_ft_sweep

    synth = make_synthetic_cs_dataset(tmp_path, n_train_per_class=4,
                                      n_test_per_class=2, image_size=40)
    base = _write_base_yaml(tmp_path, synth)

    # exactly how `wandb agent` invokes the command template
    monkeypatch.setattr(sys, "argv", [
        "run_ft_sweep",
        "--base_config", str(base), "--dataset_config", str(base),
        "--logger", "wandb",
        "--lr_v=0.002", "--seed=2", "--finetune.unlocked_groups=2",
    ])
    run_ft_sweep.main()

    assert len(fake_wandb) == 1
    run = fake_wandb[0]
    assert run.project == "aihab_sweep"          # reference's suffix scheme
    assert "seed2" in run.name and "ug2" in run.name
    assert run.config["lr_v"] == 0.002           # overrides reached config
    assert run.config["seed"] == 2
    assert run.finished

    scalars = [p for p in run.logged if "top1_acc" in p]
    assert scalars and 0.0 <= scalars[-1]["top1_acc"] <= 1.0
    # confusion-matrix image went through the wandb surface
    assert any("Confusion Matrix" in p for p in run.logged)


def test_logger_off_never_touches_wandb(fake_wandb, tmp_path, monkeypatch):
    from aihab_clip_tpu.data import make_synthetic_cs_dataset
    from aihab_clip_tpu.tools import run_ft_sweep

    synth = make_synthetic_cs_dataset(tmp_path, n_train_per_class=4,
                                      n_test_per_class=1, image_size=40)
    base = _write_base_yaml(tmp_path, synth)
    monkeypatch.setattr(sys, "argv", [
        "run_ft_sweep",
        "--base_config", str(base), "--dataset_config", str(base),
        "--logger", "off", "--train_epoch=1",
    ])
    run_ft_sweep.main()
    assert fake_wandb == []
