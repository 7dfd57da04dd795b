import numpy as np
import pytest

import jax.numpy as jnp

from aihab_clip_tpu.cache import (
    canonical_backbone_name,
    feature_cache_dir,
    feature_cache_exists,
    read_preprojection_cache,
    write_preprojection_cache,
)
from aihab_clip_tpu.config import ConfigNode
from aihab_clip_tpu.train.prolip import (
    ProjectorSpec,
    cosine_lr,
    grid_search,
    projector_accuracy,
    resolve_lambda,
    train_projector,
    view_for_epoch,
)


def test_canonical_backbone_name():
    assert canonical_backbone_name("ViT-B/16") == "ViTB16"
    assert canonical_backbone_name("ViT-B/32") == "ViTB32"
    assert canonical_backbone_name("RN50") == "RN50"
    assert (canonical_backbone_name("hf-hub:timm/ViT-SO400M-14-SigLIP")
            == "hf-hub_timm_ViT-SO400M-14-SigLIP")
    assert canonical_backbone_name("") == "unknown"


def test_feature_cache_dir_layout(tmp_path):
    cfg = ConfigNode({"root_path": str(tmp_path), "clip_backend": "openai",
                      "backbone": "ViT-B/16", "dataset": "cs", "shots": 4,
                      "seed": 2})
    d = feature_cache_dir(cfg)
    assert str(d).endswith("features_ViTB16_cs/4_shot/seed2")
    cfg2 = cfg.clone()
    cfg2.clip_backend = "openclip"
    cfg2.open_clip_model = "hf-hub:timm/ViT-SO400M-16-SigLIP2-384"
    assert "hf-hub_timm_ViT-SO400M-16-SigLIP2-384" in str(feature_cache_dir(cfg2))


def test_write_read_cache_roundtrip(tmp_path, rng):
    n, d, v = 30, 16, 3
    feats = [rng.standard_normal((n, d)).astype(np.float32) for _ in range(v)]
    labels = rng.integers(0, 5, size=n)

    cache_dir = tmp_path / "cache"
    manifest = write_preprojection_cache(
        cache_dir, lambda i: (feats[i], labels), aug_views=v, expected_n=n)
    assert manifest["n"] == n and manifest["dim"] == d
    assert manifest["write_gbps"] > 0
    assert feature_cache_exists(cache_dir, v)
    assert not feature_cache_exists(cache_dir, v + 1)

    views, lab = read_preprojection_cache(cache_dir, v)
    assert len(views) == v
    np.testing.assert_array_equal(lab, labels)
    np.testing.assert_allclose(views[0], feats[0].astype(np.float16), atol=1e-3)


def test_read_cache_label_filter(tmp_path, rng):
    feats = rng.standard_normal((10, 8)).astype(np.float32)
    labels = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
    write_preprojection_cache(tmp_path / "c", lambda i: (feats, labels), 1)
    views, lab = read_preprojection_cache(tmp_path / "c", 1, max_label=5)
    assert (lab < 5).all() and len(lab) == 5
    assert views[0].shape == (5, 8)


def test_view_cycling_matches_reference_counter():
    # simulate the reference's counter logic and compare
    for V in (1, 2, 3, 5):
        cnt = 0
        seq_ref = []
        for _ in range(12):
            if (cnt + 1) % V == 0:
                cnt = 0
            else:
                cnt += 1
            seq_ref.append(cnt)
        seq_ours = [view_for_epoch(e, V) for e in range(12)]
        assert seq_ours == seq_ref, f"V={V}"


def test_cosine_lr_schedule():
    assert cosine_lr(1.0, 0, 10) == pytest.approx(1.0)
    assert cosine_lr(1.0, 5, 10) == pytest.approx(0.5)
    assert cosine_lr(1.0, 10, 10) == pytest.approx(0.0)


def test_resolve_lambda():
    cfg = ConfigNode({"lambda_v": 0.25, "lambda_funct_1_N": False,
                      "lambda_funct_1_N2": False})
    assert resolve_lambda(cfg, 4) == 0.25
    cfg.lambda_funct_1_N = True
    assert resolve_lambda(cfg, 4) == 0.25
    cfg.lambda_funct_1_N = False
    cfg.lambda_funct_1_N2 = True
    assert resolve_lambda(cfg, 4) == pytest.approx(1 / 16)


def _toy_problem(rng, n=60, pre=16, emb=8, c=4):
    """Cached features whose projection can learn a linear separation."""
    # class prototypes in embedding space
    protos = rng.standard_normal((c, emb)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    text_weights = jnp.asarray(protos.T)  # [emb, c]
    labels = rng.integers(0, c, size=n)
    # ground-truth projector
    true_w = rng.standard_normal((pre, emb)).astype(np.float32) * 0.2
    feats = (protos[labels] + 0.05 * rng.standard_normal((n, emb))
             ).astype(np.float32) @ np.linalg.pinv(true_w)
    init = ProjectorSpec(weight=jnp.asarray(
        true_w + 0.5 * rng.standard_normal((pre, emb)).astype(np.float32)),
        bias=None)
    return feats.astype(np.float32), labels, text_weights, init


def test_train_projector_improves_accuracy(rng):
    feats, labels, tw, init = _toy_problem(rng)
    acc0 = projector_accuracy(init, feats, labels, tw)
    proj, stats = train_projector([feats], labels, tw, init, lr=1e-2, lam=0.0,
                                  epochs=30, verbose=False)
    acc1 = projector_accuracy(proj, feats, labels, tw)
    assert acc1 > acc0
    assert acc1 > 80.0
    assert stats["final_loss"] is not None


def test_train_projector_lambda_anchors_weights(rng):
    feats, labels, tw, init = _toy_problem(rng)
    free, _ = train_projector([feats], labels, tw, init, lr=1e-2, lam=0.0,
                              epochs=20, verbose=False)
    anchored, _ = train_projector([feats], labels, tw, init, lr=1e-2, lam=100.0,
                                  epochs=20, verbose=False)
    drift_free = float(jnp.sum((free.weight - init.weight) ** 2))
    drift_anch = float(jnp.sum((anchored.weight - init.weight) ** 2))
    assert drift_anch < drift_free


def test_train_projector_chunked_matches_fullbatch_roughly(rng):
    feats, labels, tw, init = _toy_problem(rng, n=64)
    full, _ = train_projector([feats], labels, tw, init, lr=1e-3, lam=0.1,
                              epochs=10, feat_batch_size=0, verbose=False)
    chunked, _ = train_projector([feats], labels, tw, init, lr=1e-3, lam=0.1,
                                 epochs=10, feat_batch_size=24, verbose=False)
    a_full = projector_accuracy(full, feats, labels, tw)
    a_chunk = projector_accuracy(chunked, feats, labels, tw)
    assert abs(a_full - a_chunk) < 25.0  # same ballpark, not identical


def test_multi_view_cycling_runs(rng):
    feats, labels, tw, init = _toy_problem(rng)
    views = [feats + 0.01 * i for i in range(3)]
    proj, stats = train_projector(views, labels, tw, init, lr=1e-2, lam=0.01,
                                  epochs=6, verbose=False)
    assert len(stats["epochs"]) == 6


def test_grid_search_picks_reasonable_combo(rng):
    feats, labels, tw, init = _toy_problem(rng, n=80)
    val_feats, val_labels = feats[:30], labels[:30]
    lr, lam, acc = grid_search(
        [feats], labels, tw, init, val_feats, val_labels, epochs=8,
        lr_grid=[1e-2, 1e-6], lambda_grid=[0.0, 10.0], verbose=False)
    assert lr in (1e-2, 1e-6) and lam in (0.0, 10.0)
    assert acc > 50.0
    assert lr == 1e-2  # the tiny-lr option can barely move the weights


def test_sharded_cache_roundtrip(tmp_path, rng):
    """Multi-host layout: per-process shard files concatenate on read."""
    from aihab_clip_tpu.cache.feature_cache import (
        feature_cache_exists_sharded,
    )

    parts = []
    for k in range(3):
        f = rng.standard_normal((10 + k, 8)).astype(np.float16)
        l = rng.integers(0, 5, size=10 + k)
        parts.append((f, l))
        write_preprojection_cache(tmp_path / "c",
                                  lambda v, f=f, l=l: (f, l), 2,
                                  shard_index=k)
    assert feature_cache_exists_sharded(tmp_path / "c", 2)
    assert not feature_cache_exists(tmp_path / "c", 2)  # no single-file view
    views, labels = read_preprojection_cache(tmp_path / "c", 2)
    np.testing.assert_array_equal(labels,
                                  np.concatenate([p[1] for p in parts]))
    assert views[0].shape == (33, 8)
    assert views[1].shape == (33, 8)
