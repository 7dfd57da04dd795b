import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aihab_clip_tpu.data import make_synthetic_cs_dataset
from aihab_clip_tpu.data.legacy import (
    cross_valid_loaders,
    data_partition,
    legacy_crop_size,
    train_valid_loaders,
)
from aihab_clip_tpu.ops.edges import (
    canny_grayscale,
    canny_rgb,
    edge_augment,
    edge_blend,
    two_view_batch,
)
from aihab_clip_tpu.train.tip_adapter import (
    build_cache_model,
    compute_confidence_interval,
    compute_mean_centroids,
    pre_load_features,
    search_hp_tip,
    tip_logits,
)


@pytest.fixture(scope="module")
def synth_args(tmp_path_factory):
    root = tmp_path_factory.mktemp("legacy")
    synth = make_synthetic_cs_dataset(root, n_train_per_class=6,
                                      n_test_per_class=2, image_size=40)
    return {
        "dataset_paths": synth["dataset_paths"],
        "index_file_names": synth["index_file_names"],
        "batch_size": 8,
        "shuffle": True,
        "preprocessing": {"resize": 32},
        "data_split": {"valid_split": 0.25, "split_seed": 42,
                       "if_grouped": True, "num_fold": 3,
                       "first_cv_only": False},
    }


def test_legacy_crop_size():
    assert legacy_crop_size({"resize": 439,
                             "augmentations": {"crop": "ratio"}}) == 384
    assert legacy_crop_size({"augmentations": {"crop": 224}}) == 224
    with pytest.raises(ValueError):
        legacy_crop_size({"augmentations": {"crop": 1.5}})


def test_data_partition_kfold(synth_args):
    ds, train_list, valid_list = data_partition(synth_args)
    assert len(train_list) == 3 and len(valid_list) == 3
    for tr, va in zip(train_list, valid_list):
        assert len(tr) + len(va) == len(ds)
        assert set(tr).isdisjoint(set(va))


def test_cross_valid_loaders(synth_args):
    pairs = cross_valid_loaders(synth_args)
    assert len(pairs) == 3
    for tr, va in pairs:
        assert tr.num_samples + va.num_samples == 24


def test_train_valid_loaders(synth_args):
    tr, va = train_valid_loaders(synth_args)
    assert va.num_samples == 6  # 25% of 24
    b = next(tr.batches())
    assert b.images.shape[1:] == (32, 32, 3)


def test_canny_transforms(rng):
    imgs = rng.integers(0, 256, size=(2, 32, 32, 3), dtype=np.uint8)
    rgb = canny_rgb(imgs)
    assert rgb.shape == imgs.shape and rgb.dtype == np.uint8
    assert set(np.unique(rgb)) <= {0, 255}
    gs = canny_grayscale(imgs)
    assert gs.shape == (2, 32, 32)
    orig, edges = edge_augment(imgs)
    assert orig is imgs and edges.shape == imgs.shape
    blend = edge_blend(imgs, alpha=0.5, beta=0.5)
    assert blend.shape == imgs.shape
    # single image path
    assert canny_rgb(imgs[0]).shape == imgs[0].shape


def test_two_view_batch(rng):
    from aihab_clip_tpu.ops.preprocess import train_transform

    imgs = jnp.asarray(rng.integers(0, 256, size=(2, 48, 48, 3),
                                    dtype=np.uint8))
    views = two_view_batch(imgs, jax.random.key(0), train_transform,
                           resolution=32, crop_mode="random")
    assert len(views) == 2
    assert views[0].shape == views[1].shape == (2, 32, 32, 3)
    assert np.abs(np.asarray(views[0]) - np.asarray(views[1])).max() > 1e-3


def test_tip_adapter_cache_and_search(rng):
    c, d, n = 4, 16, 40
    protos = rng.standard_normal((c, d)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    labels = rng.integers(0, c, size=n)
    feats = protos[labels] + 0.1 * rng.standard_normal((n, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)

    keys, values = build_cache_model(
        lambda v: (feats + 0.01 * v, labels), augment_epochs=2, num_classes=c)
    assert keys.shape == (d, n) and values.shape == (n, c)

    clip_w = jnp.asarray(protos.T)
    logits = tip_logits(jnp.asarray(feats), keys, values, clip_w,
                        beta=1.0, alpha=1.0)
    acc = float(jnp.mean(jnp.argmax(logits, -1) == jnp.asarray(labels)))
    assert acc > 0.9

    beta, alpha, best = search_hp_tip(
        jnp.asarray(feats), labels, keys, values, clip_w,
        search_step=(5, 5))
    assert best >= acc * 100 - 5


def test_mean_centroids(rng):
    feats = jnp.asarray(rng.standard_normal((12, 8)).astype(np.float32))
    labels = jnp.asarray(np.repeat(np.arange(3), 4))
    cents = compute_mean_centroids(feats, labels, 3)
    np.testing.assert_allclose(np.asarray(cents[0]),
                               np.asarray(feats[:4]).mean(0), atol=1e-5)


def test_confidence_interval():
    m, pm = compute_confidence_interval([1.0, 2.0, 3.0])
    assert m == pytest.approx(2.0)
    assert pm == pytest.approx(1.96 * np.std([1, 2, 3]) / np.sqrt(3))


def test_pre_load_features_roundtrip(tmp_path, rng):
    feats = rng.standard_normal((5, 4)).astype(np.float32)
    labels = np.arange(5)
    f1, l1 = pre_load_features(tmp_path, "val",
                               encode_split=lambda: (feats, labels),
                               load_cached=False)
    f2, l2 = pre_load_features(tmp_path, "val")  # from cache
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(l1, l2)
    with pytest.raises(FileNotFoundError):
        pre_load_features(tmp_path, "missing")
