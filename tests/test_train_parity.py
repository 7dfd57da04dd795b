"""Training parity vs the reference implementation (torch oracle).

`tools/train_parity.py` runs the reference's own training code —
`ProLIP.forward` imported and executed on CPU, and a torch loop with
`PEFT_openclip.py:240-279` step semantics — against our jitted trainers
on identical data, and gates per-step agreement.  These tests pin that
gate in-suite on tiny random-init towers; the same harness IS the
training half of the real-weight calibration
(`parity_check --weights <ckpt> --train`).
"""

import pytest

from aihab_clip_tpu.tools.train_parity import (
    PEFT_GATE_MAX_LOSS_DIFF, PROLIP_GATE_MAX_EPOCH_CE,
    PROLIP_GATE_MAX_WEIGHT_DIFF, run_peft_train_parity,
    run_prolip_train_parity)


@pytest.mark.slow
def test_prolip_training_parity_vs_reference():
    report = run_prolip_train_parity(verbose=False)
    assert report["selected_cell_match_iso"], report
    assert report["epochs_compared"] >= 20, report
    assert report["epoch_ce_max_abs_diff_iso"] <= PROLIP_GATE_MAX_EPOCH_CE
    assert (report["trained_weight_max_abs_diff_iso"]
            <= PROLIP_GATE_MAX_WEIGHT_DIFF)
    assert report["test_acc_gap_iso"] <= 1.0
    assert report["test_acc_gap_e2e"] <= 1.0
    assert report["gate_pass"]


@pytest.mark.slow
def test_peft_training_parity_vs_reference_tune_text():
    report = run_peft_train_parity(verbose=False, tune_text=True)
    assert report["torch_trainable_tensors"] == report["ours_trainable_tensors"]
    assert report["loss_max_abs_diff"] <= PEFT_GATE_MAX_LOSS_DIFF, report
    assert report["gate_pass"]


@pytest.mark.slow
def test_peft_training_parity_vs_reference_frozen_text():
    report = run_peft_train_parity(verbose=False, tune_text=False,
                                   epochs=1, batches_per_epoch=3)
    assert report["torch_trainable_tensors"] == report["ours_trainable_tensors"]
    assert report["loss_max_abs_diff"] <= PEFT_GATE_MAX_LOSS_DIFF, report
    assert report["gate_pass"]


@pytest.mark.slow
def test_peft_training_parity_siglip_vs_hf_oracle():
    """The reference's DEFAULT backbone family: reference PEFT step
    semantics on HF SiglipModel vs our jitted step on the converted
    tower — identical pixels, shared token ids."""
    from aihab_clip_tpu.tools.train_parity import run_peft_train_parity_siglip

    pytest.importorskip("transformers")
    report = run_peft_train_parity_siglip(verbose=False, tune_text=True)
    assert report["torch_trainable_params"] == report["ours_trainable_params"]
    assert report["loss_max_abs_diff"] <= PEFT_GATE_MAX_LOSS_DIFF, report
    assert report["gate_pass"]

    report2 = run_peft_train_parity_siglip(verbose=False, tune_text=False,
                                           epochs=1)
    assert report2["gate_pass"], report2
