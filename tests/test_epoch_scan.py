"""Device-resident epoch scan == host batch loop, step for step."""

import numpy as np
import pytest
from flax import traverse_util

from aihab_clip_tpu.config import ConfigNode
from aihab_clip_tpu.data import build_loaders, make_synthetic_cs_dataset
from aihab_clip_tpu.models import CLIPConfig, build_text_head, load
from aihab_clip_tpu.templates import gen_prompts
from aihab_clip_tpu.train.peft import PEFTConfig, _epoch_batch_indices, finetune

TINY = CLIPConfig(
    embed_dim=32, image_resolution=24, vision_layers=2, vision_width=64,
    vision_patch_size=8, context_length=77, vocab_size=49408,
    transformer_width=64, transformer_heads=1, transformer_layers=2)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("scan")
    synth = make_synthetic_cs_dataset(root, n_train_per_class=5,
                                      n_test_per_class=2, image_size=32)
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
    loaders = build_loaders(cfg)
    bundle = load("random:tiny-scan", random_cfg=TINY, seed=2)
    prompts, tpc = gen_prompts(use_hierarchy=False, use_descriptive=False)
    head = build_text_head(bundle.model, bundle.params, prompts, 20, tpc)
    return loaders, bundle, head


def test_epoch_batch_indices_match_splitview(setup):
    loaders, _, _ = setup
    view = loaders.train
    for epoch in (0, 1):
        idx, valid = _epoch_batch_indices(view, epoch)
        batches = list(view.batches(epoch=epoch))
        assert idx.shape[0] == len(batches)
        for s, batch in enumerate(batches):
            # view-relative -> absolute indices must match the host loop
            abs_idx = view.indices[idx[s][valid[s]]]
            np.testing.assert_array_equal(abs_idx,
                                          batch.indices[batch.valid])


def _fresh_params(bundle):
    # scan/chunked paths DONATE the trainable leaves; every run needs its
    # own copies of the shared fixture's params
    import jax

    return jax.tree.map(lambda x: np.array(x), bundle.params)


def _run(setup, device_dataset):
    loaders, bundle, head = setup
    cfg = PEFTConfig(resolution=24, num_classes=20, lr=1e-3, epochs=2,
                     crop_mode="center", device_dataset=device_dataset)
    return finetune(bundle.model, _fresh_params(bundle), loaders.train, None,
                    loaders.test, cfg, text_weights=head["text_weights"],
                    unlocked_groups=2, seed=0, verbose=False,
                    track_test=False)


def test_scan_equals_host_loop(setup):
    out_host = _run(setup, device_dataset=False)
    out_scan = _run(setup, device_dataset=True)

    flat_h = traverse_util.flatten_dict(out_host["params"])
    flat_s = traverse_util.flatten_dict(out_scan["params"])
    for k in flat_h:
        np.testing.assert_allclose(np.asarray(flat_h[k]),
                                   np.asarray(flat_s[k]),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg="/".join(k))
    assert out_scan["test"]["top1"] == pytest.approx(
        out_host["test"]["top1"], abs=1e-6)


def test_chunked_equals_full_scan(setup):
    """Double-buffered chunked epochs == one whole-epoch scan, step for
    step (same batch order, same global-step augmentation keys)."""
    loaders, _, _ = setup
    # tiny chunk budget -> several chunks per epoch (incl. a short tail)
    bytes_per_sample = int(np.prod(loaders.train.dataset.images.shape[1:]))
    out_scan = _run(setup, device_dataset=True)
    out_chunk = _run_chunked(setup, chunk_bytes=2 * 8 * bytes_per_sample)

    flat_s = traverse_util.flatten_dict(out_scan["params"])
    flat_c = traverse_util.flatten_dict(out_chunk["params"])
    for k in flat_s:
        np.testing.assert_allclose(np.asarray(flat_s[k]),
                                   np.asarray(flat_c[k]),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg="/".join(k))
    assert out_chunk["test"]["top1"] == pytest.approx(
        out_scan["test"]["top1"], abs=1e-6)


def _run_chunked(setup, chunk_bytes):
    loaders, bundle, head = setup
    cfg = PEFTConfig(resolution=24, num_classes=20, lr=1e-3, epochs=2,
                     crop_mode="center", device_dataset="chunked",
                     device_chunk_bytes=chunk_bytes)
    return finetune(bundle.model, _fresh_params(bundle), loaders.train, None,
                    loaders.test, cfg, text_weights=head["text_weights"],
                    unlocked_groups=2, seed=0, verbose=False,
                    track_test=False)


def test_chunked_with_augmentation_runs(setup):
    """Chunked path with stochastic augmentation (keys actually consumed)."""
    loaders, bundle, head = setup
    cfg = PEFTConfig(resolution=24, num_classes=20, lr=1e-3, epochs=1,
                     crop_mode="random", flip=True,
                     device_dataset="chunked",
                     device_chunk_bytes=3 * 8 * int(
                         np.prod(loaders.train.dataset.images.shape[1:])))
    out = finetune(bundle.model, _fresh_params(bundle), loaders.train, None,
                   loaders.test, cfg, text_weights=head["text_weights"],
                   unlocked_groups=1, seed=0, verbose=False,
                   track_test=False)
    assert out["test"] is not None and 0.0 <= out["test"]["top1"] <= 1.0
