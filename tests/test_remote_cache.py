"""Remote (tensorstore) cache roots: a ``file://`` URI drives the exact
code path a ``gs://`` bucket would (zarr arrays + kvstore JSON), end to
end through the cache writer, sharded merge, and the runner's ProLIP
read."""

import numpy as np
import pytest

from aihab_clip_tpu.cache import (
    feature_cache_dir,
    feature_cache_exists,
    feature_cache_exists_sharded,
    read_preprojection_cache,
    write_preprojection_cache,
)
from aihab_clip_tpu.cache.array_store import (
    LocalNpyStore,
    TensorStoreStore,
    join_cache_path,
    open_store,
)


def test_open_store_dispatch(tmp_path):
    assert isinstance(open_store(tmp_path), LocalNpyStore)
    assert isinstance(open_store(f"file://{tmp_path}"), TensorStoreStore)
    assert isinstance(open_store("gs://bucket/prefix"), TensorStoreStore)


def test_join_cache_path(tmp_path):
    local = join_cache_path(tmp_path, "a", "b")
    assert str(local) == str(tmp_path / "a" / "b")
    remote = join_cache_path("gs://bucket/root/", "a", "b")
    assert remote == "gs://bucket/root/a/b"


def test_tensorstore_roundtrip(tmp_path):
    store = TensorStoreStore(f"file://{tmp_path}/c")
    arr = np.arange(20, dtype=np.float16).reshape(4, 5)
    store.save("f0", arr)
    assert store.exists("f0")
    assert not store.exists("f1")
    np.testing.assert_array_equal(store.load("f0"), arr)
    store.write_json("manifest.json", {"n": 4})
    assert store.read_json("manifest.json") == {"n": 4}
    store.save("f0.shard1", arr)
    store.save("f0.shard0", arr + 1)
    assert store.list_arrays("f0.shard") == ["f0.shard0", "f0.shard1"]


def test_remote_cache_write_read_sharded(tmp_path):
    uri = f"file://{tmp_path}/cacheroot"
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((10, 6)).astype(np.float16)
    labels = rng.integers(0, 4, size=10).astype(np.int32)

    write_preprojection_cache(uri, lambda v: (feats + v, labels),
                              aug_views=2, expected_n=10)
    assert feature_cache_exists(uri, 2)
    views, lab = read_preprojection_cache(uri, 2)
    np.testing.assert_array_equal(lab, labels)
    np.testing.assert_array_equal(np.asarray(views[1]), feats + 1)

    # sharded layout under the same remote root
    uri2 = f"file://{tmp_path}/cacheroot_sharded"
    write_preprojection_cache(uri2, lambda v: (feats[:5], labels[:5]),
                              aug_views=1, shard_index=0)
    assert not feature_cache_exists(uri2, 1)   # no single-file layout
    # the sharded checker can't know the intended shard count; any
    # complete set of views counts (shard completeness is the launcher's
    # synchronization concern)
    assert feature_cache_exists_sharded(uri2, 1)
    write_preprojection_cache(uri2, lambda v: (feats[5:], labels[5:]),
                              aug_views=1, shard_index=1)
    assert feature_cache_exists_sharded(uri2, 1)
    views2, lab2 = read_preprojection_cache(uri2, 1)
    assert views2[0].shape[0] == 10
    np.testing.assert_array_equal(lab2, labels)


def test_remote_root_cfg_paths():
    from aihab_clip_tpu.config import ConfigNode

    cfg = ConfigNode({"root_path": "gs://bucket/aihab", "dataset": "cs",
                      "clip_backend": "openai", "backbone": "ViT-B/16",
                      "shots": 16, "seed": 3})
    d = feature_cache_dir(cfg)
    assert d == "gs://bucket/aihab/features_ViTB16_cs/16_shot/seed3"


def test_remote_embedding_cache_roundtrip(tmp_path):
    """Embedding cache on a remote root: runner-level write (PEFT path with
    cache_embeddings) then strict load, via file:// tensorstore."""
    from aihab_clip_tpu.cache import (
        cache_embeddings,
        embedding_cache_dir,
        load_embedding_cache,
    )
    from aihab_clip_tpu.config import ConfigNode
    from aihab_clip_tpu.data import build_loaders, make_synthetic_cs_dataset
    from aihab_clip_tpu.models import load as load_model

    synth = make_synthetic_cs_dataset(tmp_path, n_train_per_class=4,
                                      n_test_per_class=2, image_size=40)
    cfg = ConfigNode({
        "root_path": f"file://{tmp_path}/remote",
        "dataset": "synth", "seed": 1, "shots": 0, "subset_l3": [],
        "clip_backend": "openai", "backbone": "random:Tiny",
        "finetune": {"cache_embeddings_dir": "feat_cache_vis"},
        "data": {
            "dataset_paths": synth["dataset_paths"],
            "index_file_names": synth["index_file_names"],
            "batch_size": 8, "shuffle": False, "num_workers": 0,
            "data_split": {"valid_split": 0.25, "split_seed": 42},
            "preprocessing": {"resize": 40, "resolution": 32},
        },
    })
    loaders = build_loaders(cfg)
    bundle = load_model("random:Tiny")
    out_dir = cache_embeddings(cfg, bundle.model, bundle.params,
                               loaders.test, 32, split="test")
    assert str(out_dir).startswith("file://")
    assert out_dir == embedding_cache_dir(cfg, "test")
    cache = load_embedding_cache(out_dir)
    assert cache["embeddings"].shape[0] == loaders.test.num_samples
    assert cache["metadata"].shape[0] == loaders.test.num_samples
    assert cache["info"]["split"] == "test"
