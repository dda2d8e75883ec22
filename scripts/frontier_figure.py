#!/usr/bin/env python3
"""The round-5 fading-frontier figure: one Pareto scatter.

Plots every full-scale fading model on the two traded axes — pilot-protocol
MSE at SNR 30 dB (the hardest classical row: pilot-MMSE −10.45) against
amp-std ratio (distributional dispersion; 1 = clean) — with the two verdict
gates drawn as reference lines. The upper-left corner (non-collapsed AND
beating MMSE's best row) is visibly empty: that is the measured Pareto
verdict of RESULTS.md §Round 5 fading frontier.

Numbers are the committed artifacts, cited inline. Form per the dataviz
procedure: single labeled series (direct labels, no legend), one axis pair,
recessive grid, thin marks, neutral ink for text.
"""
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# (label, MSE@SNR30 dB (pilot protocol), amp-std ratio, source)
MODELS = [
    ("supervised\n(collapsed)", -11.02, 0.0001,
     "results/full_fading/benchmark_pilot.txt + distributional_full_fading.json"),
    ("v2  rec:adv 400", -10.77, 0.236,
     "results/full_fading_gan_v2/ + distributional_full_fading_gan_v2.json"),
    ("v4  rec:adv 200", -10.29, 0.392,
     "results/full_fading_gan_v4/ + distributional_full_fading_gan_v4.json"),
    ("v1  rec:adv 100\n(r4 champion)", -9.55, 0.609,
     "results/full_fading_gan/ + distributional_full_fading_gan.json"),
    ("v3  repair", -9.01, 0.776,
     "results/full_fading_gan_v3/ + distributional_full_fading_gan_v3.json"),
]
MMSE_30 = -10.45          # best classical row (pilot-MMSE at SNR 30)
AMP_GATE = 0.5            # non-collapse gate (amp-std ratio)
NOISY_AMP = 0.79          # raw noisy input dispersion (anchor, no EQ)

INK = "#3b3b3b"
MUTED = "#8a8a8a"
DATA = "#4c78a8"          # one categorical hue — single series, direct labels


def main(out="results/fading_frontier.png"):
    fig, ax = plt.subplots(figsize=(7.2, 5.0), dpi=150)
    fig.patch.set_facecolor("white")

    # gate lines (recessive, labeled in muted ink)
    ax.axvline(MMSE_30, color=MUTED, lw=1, ls="--", zorder=1)
    ax.axhline(AMP_GATE, color=MUTED, lw=1, ls="--", zorder=1)
    ax.text(MMSE_30 - 0.03, 0.965, "← beats pilot-MMSE's\n    best row (−10.45)",
            ha="left", va="top", fontsize=8, color=MUTED)
    ax.text(-6.1, AMP_GATE + 0.012, "non-collapse gate (amp-std ≥ 0.5)",
            ha="right", va="bottom", fontsize=8, color=MUTED)
    # the empty feasible corner
    ax.text(-11.2, 0.97, "both gates:\nempty\n(measured\nPareto)",
            ha="left", va="top", fontsize=9, color=INK, style="italic")

    xs = [m[1] for m in MODELS]
    ys = [m[2] for m in MODELS]
    ax.plot(xs, ys, color=DATA, lw=2, alpha=0.45, zorder=2)  # the ladder path
    ax.scatter(xs, ys, s=64, color=DATA, zorder=3)

    offsets = [(10, 8), (8, 4), (8, 4), (8, 0), (8, 0)]
    for (label, x, y, _src), (dx, dy) in zip(MODELS, offsets):
        ax.annotate(label, (x, y), textcoords="offset points",
                    xytext=(dx, dy), fontsize=8.5, color=INK)

    ax.scatter([-6.42], [NOISY_AMP], s=40, facecolor="white",
               edgecolor=MUTED, zorder=3)
    ax.annotate("raw noisy input", (-6.42, NOISY_AMP),
                textcoords="offset points", xytext=(-6, 8),
                fontsize=8, color=MUTED, ha="right")

    ax.set_xlabel("pilot-protocol MSE at SNR 30 dB  (dB, lower is better →"
                  " plotted left)", color=INK)
    ax.set_ylabel("amp-std ratio  (distributional dispersion, 1 = clean)",
                  color=INK)
    ax.set_title("Full-scale fading frontier: paired-metric wins trade "
                 "directly against dispersion", color=INK, fontsize=11)
    ax.set_xlim(-11.25, -6.0)
    ax.set_ylim(-0.03, 1.0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(MUTED)
    ax.tick_params(colors=MUTED, labelsize=8)
    ax.grid(True, color="#ebebeb", lw=0.6, zorder=0)
    ax.set_axisbelow(True)

    fig.tight_layout()
    Path(out).parent.mkdir(exist_ok=True)
    fig.savefig(out)
    print("wrote", out)


if __name__ == "__main__":
    main(*sys.argv[1:])
