"""Offline analysis tools: outlier scorers, selection/materialization,
embedding visualizer, sweep launcher override parsing."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from aihab_clip_tpu.tools.outlier_cleaning import (
    MultiPrototypeScorer,
    SingleCentroidScorer,
    heuristic_k,
    materialize_clean_split,
    select_outliers,
)


def _toy_embeddings(rng, n_per_class=40, c=3, dim=16, outliers_per_class=2):
    protos = rng.standard_normal((c, dim)).astype(np.float32)
    protos /= np.linalg.norm(protos, axis=-1, keepdims=True)
    embs, labels, files = [], [], []
    outlier_names = []
    for ci in range(c):
        x = protos[ci] + 0.05 * rng.standard_normal((n_per_class, dim))
        # inject outliers pointing at ANOTHER class's prototype
        for j in range(outliers_per_class):
            x[j] = protos[(ci + 1) % c] + 0.05 * rng.standard_normal(dim)
            outlier_names.append(f"c{ci}_{j:03d}.jpg")
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        embs.append(x)
        labels.extend([ci] * n_per_class)
        files.extend(f"c{ci}_{j:03d}.jpg" for j in range(n_per_class))
    emb = np.concatenate(embs, 0)
    meta = pd.DataFrame({
        "file_name": files,
        "ground_truth_num_label": labels,
        "ground_truth_word_label": [f"class{l}" for l in labels],
        "ground_truth_L2_num_label": labels,
    })
    return emb.astype(np.float32), np.asarray(labels), meta, set(outlier_names)


def test_heuristic_k():
    assert heuristic_k(10) == 1
    assert heuristic_k(50) == 3
    assert heuristic_k(150) == 4
    assert heuristic_k(250) == 5
    assert heuristic_k(500) == 6


def test_single_centroid_scorer_flags_injected_outliers(rng):
    emb, labels, meta, outliers = _toy_embeddings(rng)
    scorer = SingleCentroidScorer(emb, labels, meta)
    scores = scorer.score_centroid_distance()
    assert list(scores.columns) == [
        "file_name", "ground_truth_num_label", "ground_truth_word_label",
        "ground_truth_L2_num_label", "sim_to_centroid", "outlier_score",
        "class_size", "rank_in_class", "pct_rank_in_class", "is_bottom_5pct"]
    # sorted by outlier score desc -> injected outliers on top
    top = set(scores.head(len(outliers))["file_name"])
    assert top == outliers
    assert (scores["class_size"] == 40).all()
    # bottom-5% flag covers ~5% per class
    assert scores["is_bottom_5pct"].sum() >= len(outliers)


def test_multi_prototype_scorer_margin(rng):
    emb, labels, meta, outliers = _toy_embeddings(rng)
    scorer = MultiPrototypeScorer(emb, labels, meta)
    pres = scorer.compute_prototypes(k_mode="fixed", k_fixed=2)
    assert all(k == 2 for k in pres.k_per_class.values())
    scores = scorer.score_prototype_distance()
    assert "margin_to_other_class" in scores.columns
    assert list(scores.columns)[-1] == "margin_to_other_class"

    # with a single prototype per class, injected outliers (which point at
    # another class's prototype) must have negative margin
    scorer1 = MultiPrototypeScorer(emb, labels, meta)
    scorer1.compute_prototypes(k_mode="fixed", k_fixed=1)
    scores1 = scorer1.score_prototype_distance()
    flagged = scores1[scores1["margin_to_other_class"] < 0]
    assert outliers <= set(flagged["file_name"])


def test_multi_prototype_heuristic_and_safety_cap(rng):
    emb, labels, meta, _ = _toy_embeddings(rng, n_per_class=25)
    scorer = MultiPrototypeScorer(emb, labels, meta)
    pres = scorer.compute_prototypes(k_mode="heuristic",
                                     min_samples_per_proto=15)
    # 25 samples: heuristic 3, safety cap 25//15 = 1
    assert all(k == 1 for k in pres.k_per_class.values())


def test_select_outliers_modes(rng):
    emb, labels, meta, outliers = _toy_embeddings(rng)
    scorer = MultiPrototypeScorer(emb, labels, meta)
    scorer.compute_prototypes(k_mode="fixed", k_fixed=1)
    scores = scorer.score_prototype_distance()

    sel = select_outliers(scores, mode="bottom_pct", pct=0.05)
    assert len(sel) >= len(outliers)
    sel2 = select_outliers(scores, mode="margin", margin_threshold=0.0)
    assert outliers <= set(sel2["file_name"])
    with pytest.raises(ValueError):
        select_outliers(scores, mode="threshold")
    with pytest.raises(ValueError):
        select_outliers(scores, mode="bogus")


def test_materialize_clean_split(tmp_path, rng):
    src = tmp_path / "src"
    src.mkdir()
    import cv2

    rows = []
    for i in range(6):
        name = f"img_{i}.jpg"
        cv2.imwrite(str(src / name), np.zeros((8, 8, 3), np.uint8))
        rows.append({"file": name, "BH_PLOT_DESC": "Urban", "ID": f"P{i}"})
    pd.DataFrame(rows).to_csv(src / "index.csv", index=False)

    selected = pd.DataFrame({"file_name": ["img_1.jpg", "img_4.jpg"]})
    stats = materialize_clean_split(selected, src, tmp_path / "dst",
                                    "index.csv")
    assert stats == {"kept": 4, "dropped": 2}
    idx = pd.read_csv(tmp_path / "dst" / "index.csv")
    assert len(idx) == 4
    assert not (tmp_path / "dst" / "img_1.jpg").exists()
    assert (tmp_path / "dst" / "img_0.jpg").exists()


def test_feat_vis_reduce_and_cli(tmp_path, rng):
    """feat_vis over a real embedding cache dir (t-SNE fallback path)."""
    import json

    from aihab_clip_tpu.tools.feat_vis import main as feat_vis_main

    emb, labels, meta, _ = _toy_embeddings(rng, n_per_class=20)
    cache = tmp_path / "cache"
    cache.mkdir()
    np.save(cache / "embeddings.npy", emb)
    np.save(cache / "labels.npy", labels.astype(np.int32))
    meta.to_csv(cache / "metadata.csv", index=False)
    (cache / "meta.json").write_text(json.dumps({"split": "test"}))

    feat_vis_main(["--cache_dir", str(cache), "--method", "tsne",
                   "--pca_dim", "8"])
    coords = np.load(cache / "vis_tsne_coords.npy")
    assert coords.shape == (len(labels), 2)


def test_sweep_override_parsing():
    from aihab_clip_tpu.tools.run_ft_sweep import parse_overrides

    out = parse_overrides(["--lr_v=1e-4", "--finetune.unlocked_groups", "5",
                           "--seed=3"])
    assert out == [("lr_v", "1e-4"), ("finetune.unlocked_groups", "5"),
                   ("seed", "3")]
    with pytest.raises(ValueError):
        parse_overrides(["positional"])
    with pytest.raises(ValueError):
        parse_overrides(["--dangling"])
