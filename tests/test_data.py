import numpy as np
import pytest

from aihab_clip_tpu.config import ConfigNode
from aihab_clip_tpu.data import (
    LabelIndex,
    build_loaders,
    derive_test_paths,
    few_shot_indices,
    load_folders,
    make_synthetic_cs_dataset,
    stratified_group_split,
)
from aihab_clip_tpu.taxonomy import CS_CLASSNAMES, REASSIGN_NAME_LABEL_L3


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    return make_synthetic_cs_dataset(root, n_train_per_class=6,
                                     n_test_per_class=3, image_size=48)


@pytest.fixture(scope="module")
def cfg(synth):
    return ConfigNode({
        "seed": 1,
        "shots": 0,
        "subset_l3": [],
        "data": {
            "dataset_paths": synth["dataset_paths"],
            "index_file_names": synth["index_file_names"],
            "batch_size": 8,
            "shuffle": True,
            "num_workers": 0,
            "data_split": {"valid_split": 0.2, "split_seed": 42},
            "use_l2_label": False,
            "preprocessing": {"resize": 32, "resolution": 24},
        },
    })


def test_label_index_and_boundary_fallback(synth):
    idx = LabelIndex(f"{synth['train_dir']}/index.csv")
    rec = idx.lookup("TRAIN_00_000.JPG")  # case-insensitive
    assert rec is not None
    assert rec.plot_word_label == synth["classes"][0]
    assert rec.plot_label == REASSIGN_NAME_LABEL_L3[synth["classes"][0]]
    # boundary row (last image of each class) fell back to poly label
    rec_b = idx.lookup("train_01_005.jpg")
    assert rec_b.plot_word_label == synth["classes"][1]
    assert rec_b.plot_label == REASSIGN_NAME_LABEL_L3[synth["classes"][1]]
    # unlabeled row filtered out
    assert idx.lookup("train_unlabeled.jpg") is None


def test_bulk_load(synth):
    ds = load_folders(synth["dataset_paths"], synth["index_file_names"],
                      resize_dim=32)
    assert ds.images.shape == (24, 32, 32, 3)
    assert ds.images.dtype == np.uint8
    assert len(ds.labels) == 24
    assert set(np.unique(ds.labels)) == {
        REASSIGN_NAME_LABEL_L3[c] for c in synth["classes"]}
    # classes have distinct mean colors (RGB order sanity)
    c0 = ds.images[ds.labels == ds.labels[0]].mean(axis=(0, 1, 2))
    c_other = ds.images[ds.labels != ds.labels[0]].mean(axis=(0, 1, 2))
    assert np.abs(c0 - c_other).max() > 10


def test_bulk_load_cache_roundtrip(synth, tmp_path):
    ds1 = load_folders(synth["dataset_paths"], synth["index_file_names"],
                       resize_dim=32, cache_dir=str(tmp_path))
    ds2 = load_folders(synth["dataset_paths"], synth["index_file_names"],
                       resize_dim=32, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(ds1.images), np.asarray(ds2.images))
    assert ds1.file_names == ds2.file_names


def test_derive_test_paths():
    assert derive_test_paths(["/a/x_train", "/b/y_train"]) == [
        "/a/x_test", "/b/y_test"]


def test_stratified_group_split_keeps_groups_disjoint(rng):
    labels = np.repeat(np.arange(4), 30)
    groups = np.concatenate([np.repeat(np.arange(10), 3) + 100 * c
                             for c in range(4)])
    tr, va = stratified_group_split(labels, groups, 0.2, seed=42)
    assert len(tr) + len(va) == 120
    assert set(groups[tr]).isdisjoint(set(groups[va]))
    # roughly stratified
    assert 0.1 < len(va) / 120 < 0.35


def test_few_shot_indices_determinism():
    labels = np.repeat(np.arange(3), 10)
    r1 = few_shot_indices(labels, 4, np.random.RandomState(7))
    r2 = few_shot_indices(labels, 4, np.random.RandomState(7))
    np.testing.assert_array_equal(r1, r2)
    assert len(r1) == 12
    for c in range(3):
        sel_c = r1[labels[r1] == c]
        assert len(sel_c) == 4
        assert len(set(sel_c.tolist())) == 4  # no replacement when enough


def test_few_shot_with_replacement():
    labels = np.array([0, 0, 1])
    sel = few_shot_indices(labels, 4, np.random.RandomState(0))
    assert len(sel) == 8
    assert (labels[sel] == 1).sum() == 4  # class 1 sampled with replacement


def test_build_loaders_full_data(cfg):
    bundle = build_loaders(cfg)
    info = bundle.info
    assert not info["is_few_shot"]
    assert info["train_size"] + info["val_size"] == 24
    assert bundle.test.num_samples == 12
    # batches padded to fixed shape with a validity mask
    batches = list(bundle.test.batches())
    assert all(b.images.shape == (8, 32, 32, 3) for b in batches)
    assert sum(b.n_valid for b in batches) == 12


def test_build_loaders_few_shot(cfg):
    c = cfg.clone()
    c.shots = 2
    bundle = build_loaders(c)
    info = bundle.info
    assert info["is_few_shot"] and info["shots"] == 2
    assert info["train_size"] == 2 * 4
    sel_map = info["selection_by_class"]
    assert len(sel_map) == 4
    assert all(len(v) == 2 for v in sel_map.values())
    # val drawn before few-shot: unchanged vs full-data run
    assert info["val_size"] > 0


def test_build_loaders_subset(cfg, synth):
    c = cfg.clone()
    c.subset_l3 = [synth["classes"][0], synth["classes"][1]]
    bundle = build_loaders(c)
    assert bundle.info["subset_enabled"]
    labels = set(np.unique(bundle.train_dataset.labels))
    expected = {REASSIGN_NAME_LABEL_L3[n] for n in c.subset_l3}
    assert labels == expected


def test_split_view_shuffle_determinism(cfg):
    bundle = build_loaders(cfg)
    a = [b.indices.tolist() for b in bundle.train.batches(epoch=0)]
    b_ = [b.indices.tolist() for b in bundle.train.batches(epoch=0)]
    c = [b.indices.tolist() for b in bundle.train.batches(epoch=1)]
    assert a == b_
    assert a != c


def test_metadata_rows(cfg):
    bundle = build_loaders(cfg)
    batch = next(bundle.test.batches())
    rows = bundle.test.metadata_rows(batch.indices)
    assert len(rows) == batch.n_valid
    assert {"l2_label", "poly_label", "plot_word_label", "file_name",
            "plot_idx", "image_source"} <= set(rows[0])


def test_build_loaders_eval_batch_size(cfg):
    """`data.eval_batch_size` widens ONLY val/test batches (eval has no
    optimizer memory; metrics reduce through one confusion matrix, so
    results are batch-size invariant). 0/absent = train batch size."""
    c = cfg.clone()
    c.data.eval_batch_size = 12
    bundle = build_loaders(c)
    assert bundle.train.batch_size == 8
    assert bundle.val.batch_size == 12
    assert bundle.test.batch_size == 12
    batches = list(bundle.test.batches())
    assert all(b.images.shape[0] == 12 for b in batches)
    assert sum(b.n_valid for b in batches) == 12
    # default: unchanged
    assert build_loaders(cfg).test.batch_size == 8
