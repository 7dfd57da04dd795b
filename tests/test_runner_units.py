"""Unit tests for runner helpers (L2 eval context gating, sweep naming)."""

from aihab_clip_tpu.config import ConfigNode
from aihab_clip_tpu.runner import _l2_eval_ctx
from aihab_clip_tpu.taxonomy import NUM_L2
from aihab_clip_tpu.tools.run_ft_sweep import sweep_run_name


def test_l2_ctx_disabled_by_default():
    cfg = ConfigNode({"finetune": {"eval_l2": False}, "subset_l3": []})
    assert _l2_eval_ctx(cfg, 20) is None


def test_l2_ctx_enabled():
    cfg = ConfigNode({"finetune": {"eval_l2": True, "l2_eval_mode": "logits"},
                      "subset_l3": []})
    ctx = _l2_eval_ctx(cfg, 20)
    assert ctx is not None
    assert ctx["num_l2"] == NUM_L2
    assert ctx["mode"] == "logits"
    assert ctx["topk"] == (1, 3)
    # argmax mode reports top-1 only
    cfg.finetune.l2_eval_mode = "argmax"
    assert _l2_eval_ctx(cfg, 20)["topk"] == (1,)


def test_l2_ctx_disabled_with_subset(capsys):
    cfg = ConfigNode({"finetune": {"eval_l2": True},
                      "subset_l3": ["Grassland-ish", 5]})
    assert _l2_eval_ctx(cfg, 20) is None
    assert "subset_l3" in capsys.readouterr().out


def test_l2_ctx_disabled_on_class_mismatch(capsys):
    cfg = ConfigNode({"finetune": {"eval_l2": True}, "subset_l3": []})
    assert _l2_eval_ctx(cfg, 7) is None  # 7 classes != 20-entry L3 map
    assert "mismatch" in capsys.readouterr().out


def test_sweep_run_name():
    cfg = ConfigNode({"dataset": "cs", "shots": 4, "seed": 2,
                      "open_clip_model": "hf-hub:timm/ViT-B-16-SigLIP",
                      "train_epoch": 10,
                      "finetune": {"unlocked_groups": 5}})
    name = sweep_run_name(cfg)
    assert name == "cs_s4_seed2_ViT-B-16-SigLIP_10ep_ug5"


def test_resolve_device_dataset_tristate():
    from aihab_clip_tpu.runner import _resolve_device_dataset

    class _View:
        num_samples = 4

        class dataset:
            import numpy as _np
            images = _np.zeros((4, 8, 8, 3), _np.uint8)

    class _Loaders:
        train = _View()

    # explicit values pass through untouched
    for setting, want in [(True, True), (False, False),
                          ("chunked", "chunked"), ("CHUNKED", "chunked")]:
        cfg = ConfigNode({"device_dataset": setting})
        assert _resolve_device_dataset(cfg, _Loaders()) == want
    # auto on CPU -> host loop (no dispatch-latency problem to solve)
    cfg = ConfigNode({"device_dataset": "auto"})
    assert _resolve_device_dataset(cfg, _Loaders()) is False


def test_resolve_fused_prefix():
    from aihab_clip_tpu.runner import _resolve_fused_prefix

    assert _resolve_fused_prefix("auto") == -1
    assert _resolve_fused_prefix(True) == -1
    for off in ("off", "false", "none", False, 0, "0"):
        assert _resolve_fused_prefix(off) == 0
    assert _resolve_fused_prefix(3) == 3
    assert _resolve_fused_prefix("7") == 7
