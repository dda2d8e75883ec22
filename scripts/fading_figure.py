#!/usr/bin/env python3
"""Combined 2x2 fading-benchmark figure (results/RESULTS.md §Fading-channel
models): one panel per trained fading task, pilot-protocol MSE vs SNR for
the learned equalizer and the strongest classical rows. Parses the archived
tables in results/fading/*.txt so the figure always matches the recorded
numbers. Colors: Okabe-Ito, fixed per entity."""
import re
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

COLORS = {"GAN": "#D55E00", "MMSE": "#0072B2", "RLS": "#009E73",
          "NoEQ": "#999999"}
PANELS = [
    ("multipath_nonlinear_pilot_table.txt",
     "Multipath + PA/IQ/PN  (selective: learned EQ wins)"),
    ("multipath_linear_pilot_table.txt",
     "Multipath, linear  (selective: learned EQ wins)"),
    ("rayleigh_pilot_table.txt",
     "Flat Rayleigh  (pilot CSI sufficient: MMSE wins)"),
    ("rician_pilot_table.txt",
     "Flat Rician K=3  (pilot CSI sufficient: MMSE wins)"),
]


def parse(path):
    rows = {}
    header = None
    for line in Path(path).read_text().splitlines():
        if re.match(r"\s*SNR", line):
            header = line.split()
            continue
        m = re.match(r"\s*(-?\d+(?:\.\d+)?)\s+(-?[\d.\s-]+)$", line)
        if header and m:
            vals = line.split()
            rows[float(vals[0])] = {h: float(v) for h, v in
                                    zip(header[2:], vals[1:])}
            # header is: SNR (dB) GAN MMSE Wiener DFE RLS NoEQ -> header[2:]
    return rows


def main():
    fig, axes = plt.subplots(2, 2, figsize=(11, 8), sharex=True)
    for ax, (fname, title) in zip(axes.ravel(), PANELS):
        rows = parse(Path("results/fading") / fname)
        snrs = sorted(rows)
        for series in ("GAN", "MMSE", "RLS", "NoEQ"):
            ax.plot(snrs, [rows[s][series] for s in snrs], "-o", ms=4,
                    lw=1.8, color=COLORS[series], label=series)
        ax.set_title(title, fontsize=10)
        ax.grid(alpha=0.25, lw=0.5)
        ax.invert_yaxis()  # lower MSE (more negative dB) is better -> up
    for ax in axes[1]:
        ax.set_xlabel("SNR (dB)")
    for ax in axes[:, 0]:
        ax.set_ylabel("MSE (dB)  —  better ↑")
    axes[0, 0].legend(frameon=False, fontsize=9)
    fig.suptitle("Fading-trained 258-param residual GAN vs classical "
                 "equalizers (fair pilot protocol, 200 trials)", fontsize=12)
    fig.tight_layout(rect=(0, 0, 1, 0.96))
    out = Path("results/fading/fading_2x2.png")
    fig.savefig(out, dpi=150)
    print("wrote", out)


if __name__ == "__main__":
    main()
