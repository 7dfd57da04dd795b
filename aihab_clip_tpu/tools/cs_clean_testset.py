#!/usr/bin/env python
"""Test-set cleaning CLI: score / select / materialize subcommands over a
cached embedding split (reference `/root/reference/tools/cs_clean_testset.py`,
whose select/materialize raise NotImplementedError — implemented here).

Examples:
    python -m aihab_clip_tpu.tools.cs_clean_testset score \
        --cache_dir feat_cache_vis/ViTB16_cs/test/seed1 --scorer multi \
        --out scores.csv
    python -m aihab_clip_tpu.tools.cs_clean_testset select \
        --scores scores.csv --mode bottom_pct --pct 0.05 --out selected.csv
    python -m aihab_clip_tpu.tools.cs_clean_testset materialize \
        --selected selected.csv --src_dir data/CS_test --dst_dir data/CS_test_clean \
        --index_file index.csv
"""

from __future__ import annotations

import argparse
from pathlib import Path

import pandas as pd


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    s = sub.add_parser("score", help="score a cached embedding split")
    s.add_argument("--cache_dir", required=True)
    s.add_argument("--scorer", choices=["single", "multi"], default="single")
    s.add_argument("--k_mode", choices=["heuristic", "fixed"],
                   default="heuristic")
    s.add_argument("--k_fixed", type=int, default=2)
    s.add_argument("--k_max", type=int, default=4)
    s.add_argument("--out", type=str, default=None, help="output CSV path")

    se = sub.add_parser("select", help="select outlier rows from scores")
    se.add_argument("--scores", required=True)
    se.add_argument("--mode", choices=["bottom_pct", "threshold", "margin"],
                    default="bottom_pct")
    se.add_argument("--pct", type=float, default=0.05)
    se.add_argument("--threshold", type=float, default=None)
    se.add_argument("--margin_threshold", type=float, default=None)
    se.add_argument("--out", type=str, required=True)

    m = sub.add_parser("materialize", help="write a cleaned dataset folder")
    m.add_argument("--selected", required=True)
    m.add_argument("--src_dir", required=True)
    m.add_argument("--dst_dir", required=True)
    m.add_argument("--index_file", required=True)
    m.add_argument("--link", action="store_true",
                   help="symlink instead of copy")
    return p


def _run_score(args) -> pd.DataFrame:
    from ..cache import load_embedding_cache
    from .outlier_cleaning import MultiPrototypeScorer, SingleCentroidScorer

    cache = load_embedding_cache(args.cache_dir)
    if args.scorer == "single":
        scorer = SingleCentroidScorer(cache["embeddings"], cache["labels"],
                                      cache["metadata"])
        scores = scorer.score_centroid_distance()
        sim_col = "sim_to_centroid"
    else:
        scorer = MultiPrototypeScorer(cache["embeddings"], cache["labels"],
                                      cache["metadata"])
        scorer.compute_prototypes(k_mode=args.k_mode, k_fixed=args.k_fixed,
                                  k_max=args.k_max)
        scores = scorer.score_prototype_distance()
        sim_col = "sim_to_prototype"

    print(f"[score] {len(scores)} rows; "
          f"mean {sim_col}={scores[sim_col].mean():.4f}; "
          f"bottom-5% flagged={int(scores['is_bottom_5pct'].sum())}")
    per_class = scores.groupby("ground_truth_num_label")["outlier_score"]
    print("[score] per-class outlier score (mean/max):")
    for label, grp in per_class:
        print(f"  class {label}: {grp.mean():.4f} / {grp.max():.4f}")
    if args.out:
        scores.to_csv(args.out, index=False)
        print(f"[score] -> {args.out}")
    return scores


def main(argv=None) -> None:
    from ..utils import honor_jax_platforms_env

    honor_jax_platforms_env()
    args = build_argparser().parse_args(argv)
    if args.command == "score":
        _run_score(args)
    elif args.command == "select":
        from .outlier_cleaning import select_outliers

        scores = pd.read_csv(args.scores)
        selected = select_outliers(scores, mode=args.mode, pct=args.pct,
                                   threshold=args.threshold,
                                   margin_threshold=args.margin_threshold)
        selected.to_csv(args.out, index=False)
        print(f"[select] {len(selected)} / {len(scores)} rows -> {args.out}")
    elif args.command == "materialize":
        from .outlier_cleaning import materialize_clean_split

        selected = pd.read_csv(args.selected)
        stats = materialize_clean_split(selected, Path(args.src_dir),
                                        Path(args.dst_dir), args.index_file,
                                        copy=not args.link)
        print(f"[materialize] kept={stats['kept']} dropped={stats['dropped']} "
              f"-> {args.dst_dir}")


if __name__ == "__main__":
    main()
