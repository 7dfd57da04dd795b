"""End-to-end zero-shot pipeline parity (our device pipeline vs the
reference torch pipeline with converted weights) on synthetic data."""

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
    # logits must stay close and predictions essentially identical
    assert report["logit_mean_abs_diff"] < 0.5
    assert report["top1_prediction_agreement"] >= 0.9
    assert report["top1_acc_gap"] <= 0.1
