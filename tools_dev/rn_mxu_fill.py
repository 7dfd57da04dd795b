"""MXU lane-fill arithmetic for the ModifiedResNet family (r5).

VERDICT r4 item 6 asked why RN50x4 sits at 54.5% MFU while RN50x64
reaches 81.9%.  This script computes, per model, the FLOP-weighted
MXU fill factor: every bottleneck conv lowers to GEMMs whose K/N dims
are the stage channel counts, and the MXU pads both to multiples of
128 lanes (fill = C / (ceil(C/128)*128); efficiency ~ fill_K * fill_N).

Widths (reference `clip/model.py` ModifiedResNet, shape facts): RN50/101
w=64, RN50x4 w=80, RN50x16 w=96, RN50x64 w=128.  Only RN50x64's channel
grid (128/256/512/1024 internal) is all 128-multiples; RN50x4's
(80/160/320/640) is the family's worst fit.

Run: python tools_dev/rn_mxu_fill.py   (host-only, no TPU needed)

Output (checked against the measured family MFUs, BENCHMARKS.md):

    model    fill    measured  measured/fill
    RN50     90.1%   52.7%     58.5%
    RN101    95.2%   60.3%     63.3%
    RN50x4   77.2%   54.5%     70.6%
    RN50x16  90.8%   64.2%     70.7%
    RN50x64  100.0%  81.9%     81.9%

Dividing measured MFU by the fill factor collapses RN50x4 ONTO RN50x16
(70.6 vs 70.7): the entire x4-vs-x16 gap is 128-lane padding waste.
The residual 58->82% spread is model scale — the traffic-bound fixed
parts (stem, preprocess, downsample adds, attnpool) amortize over more
FLOPs, and the per-op GEMMs grow past the size where traffic dominates
(same effect as the measured RN50 split: stage1's 56^2x64 ops sit at
their HBM bounds, BENCHMARKS.md "ModifiedResNet encode").
"""

from __future__ import annotations

import math


def fill(c: int) -> float:
    return c / (math.ceil(c / 128) * 128)


MODELS = [
    # name, width, layers, res, measured MFU (BENCHMARKS family table)
    ("RN50", 64, (3, 4, 6, 3), 224, 0.527),
    ("RN101", 64, (3, 4, 23, 3), 224, 0.603),
    ("RN50x4", 80, (4, 6, 10, 6), 288, 0.545),
    ("RN50x16", 96, (6, 8, 18, 8), 384, 0.642),
    ("RN50x64", 128, (3, 15, 36, 10), 448, 0.819),
]


def flop_weighted_fill(width: int, layers, res: int) -> float:
    tot_f = tot_eff = 0.0
    for st in range(4):
        cm = width * 2 ** st          # bottleneck internal width
        co = cm * 4                   # expansion
        s = res // (4 * 2 ** st)      # stage spatial edge
        for k, n in ((co, cm), (9 * cm, cm), (cm, co)):  # 1x1, 3x3, 1x1
            f = 2 * s * s * k * n * layers[st]
            tot_f += f
            tot_eff += f * fill(k) * fill(n)
    return tot_eff / tot_f


def main() -> None:
    print(f"{'model':8s} {'fill':>7s} {'measured':>9s} {'meas/fill':>10s}")
    for name, w, layers, res, mfu in MODELS:
        e = flop_weighted_fill(w, layers, res)
        print(f"{name:8s} {e:7.1%} {mfu:9.1%} {mfu / e:10.1%}")


if __name__ == "__main__":
    main()
