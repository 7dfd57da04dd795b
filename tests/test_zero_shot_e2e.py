"""End-to-end zero-shot slice on CPU: synthetic CS data -> bulk load ->
device preprocess -> tiny random CLIP -> prompt-ensemble text head ->
logits -> full metric stack."""

import numpy as np
import pytest

import jax.numpy as jnp

from aihab_clip_tpu.config import ConfigNode
from aihab_clip_tpu.data import build_loaders, make_synthetic_cs_dataset
from aihab_clip_tpu.models import (
    CLIPConfig,
    build_text_head,
    compute_text_weights,
    load,
)
from aihab_clip_tpu.taxonomy import CS_CLASSNAMES, NUM_L2, l3_to_l2_array
from aihab_clip_tpu.templates import gen_prompts
from aihab_clip_tpu.train import ClassificationTracker, evaluate

TINY = CLIPConfig(
    embed_dim=32, image_resolution=24, vision_layers=2, vision_width=64,
    vision_patch_size=8, context_length=77, vocab_size=49408,
    transformer_width=64, transformer_heads=1, transformer_layers=2)


@pytest.fixture(scope="module")
def bundle():
    return load("random:tiny", random_cfg=TINY)


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    synth = make_synthetic_cs_dataset(root, n_train_per_class=4,
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


def test_text_head_shapes(bundle):
    prompts, tpc = gen_prompts(use_hierarchy=True, use_descriptive=True)
    head = build_text_head(bundle.model, bundle.params, prompts,
                           num_classes=20, num_templates=tpc, batch_size=16)
    assert head["text_weights"].shape == (32, 20)
    assert head["prompt_tokens"].shape == (20 * tpc, 77)
    assert head["text_weights_before"].shape == (20, tpc, 64)
    # columns are unit-norm
    norms = np.linalg.norm(np.asarray(head["text_weights"]), axis=0)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_text_head_matches_jittable_core(bundle):
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    head = build_text_head(bundle.model, bundle.params, prompts,
                           num_classes=20, num_templates=tpc)
    w = compute_text_weights(bundle.model, bundle.params,
                             head["prompt_tokens"], 20, tpc)
    np.testing.assert_allclose(np.asarray(w), np.asarray(head["text_weights"]),
                               atol=1e-5)


def test_zero_shot_eval_end_to_end(bundle, data):
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    head = build_text_head(bundle.model, bundle.params, prompts,
                           num_classes=20, num_templates=tpc)
    tracker = ClassificationTracker()
    l2_ctx = {"l3_to_l2": l3_to_l2_array(), "num_l2": NUM_L2,
              "mode": "argmax"}
    res = evaluate(bundle.model, bundle.params, data.test,
                   head["text_weights"], resolution=24, num_classes=20,
                   return_confusion_matrix=True, l2_eval_ctx=l2_ctx,
                   tracker=tracker)
    assert set(res) >= {"loss", "top1", "top3", "f1", "mcc", "cm", "l2"}
    assert 0.0 <= res["top1"] <= res["top3"] <= 1.0
    assert res["cm"].shape == (20, 20)
    assert res["cm"].sum() == data.test.num_samples  # padding excluded
    assert res["l2"] is not None and "top1" in res["l2"]
    mis, cor = tracker.to_dataframes()
    total = (0 if mis is None else len(mis)) + (0 if cor is None else len(cor))
    assert total == data.test.num_samples
    if mis is not None:
        assert "top3_prob_1" in mis.columns
        assert (mis["predicted_label"] != mis["ground_truth_num_label"]).all()


def test_random_model_cache_roundtrip(tmp_path):
    b = load("random:tiny", random_cfg=TINY, cache_dir=str(tmp_path), seed=3)
    assert b.source == "random"
    assert b.config.embed_dim == 32
