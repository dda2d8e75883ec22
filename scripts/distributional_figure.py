#!/usr/bin/env python3
"""PSD-overlay + amplitude-distribution figure for the adversarial-value
study (results/RESULTS.md §Adversarial value).

Left: mean periodogram (dB) per FFT bin of clean / noisy / supervised /
GAN / residual-GAN mini outputs on the nonlinear task — the visual behind
the psd_distance_db column. Right: per-sample amplitude density — the
visual behind the MMD/amp-moment columns.

Colors: Okabe-Ito colorblind-safe set, fixed assignment per entity.
Run on CPU: ``python scripts/distributional_figure.py``.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from eval_checkpoint import load_params  # noqa: E402
from ofdmgan_tpu.eval.distributional import periodogram_db  # noqa: E402
from ofdmgan_tpu.models.flat import make_generator_flat_apply  # noqa: E402
from ofdmgan_tpu.signal import DatagenConfig  # noqa: E402
from ofdmgan_tpu.signal.datagen import synthetic_batch  # noqa: E402

# fixed entity -> color (Okabe-Ito), never cycled
COLORS = {
    "clean": "#000000",
    "noisy": "#999999",
    "supervised": "#0072B2",
    "GAN": "#D55E00",
    "residual GAN": "#009E73",
}

MODELS = {
    "supervised": ("results/distributional_checkpoints/mini_sup_nl", False),
    "GAN": ("results/nonlinear_checkpoint", False),
    "residual GAN": ("results/residual_checkpoints/nonlinear/"
                     "champion_params_g.npz", True),
}


def main():
    cfg = DatagenConfig.make(frame_length=16, snr_range=(0, 30),
                             nonlinear=True)
    batch = synthetic_batch(jax.random.PRNGKey(1234), 16384, cfg)
    noisy, clean = batch["noisy"], batch["clean"]

    frames = {"clean": clean, "noisy": noisy}
    for label, (path, residual) in MODELS.items():
        if not Path(path).exists():
            print(f"skip {label}: {path} missing")
            continue
        params = load_params(path, ema=False)
        apply = make_generator_flat_apply(input_residual=residual)
        frames[label] = jax.jit(apply)(params, noisy)

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4.2))
    freq = np.arange(16)
    for label, x in frames.items():
        psd = np.asarray(periodogram_db(x))  # already batch-meaned, [L] dB
        ls = "--" if label == "clean" else "-"
        lw = 2.2 if label == "clean" else 1.8
        ax1.plot(freq, psd, ls, color=COLORS[label], lw=lw, label=label)
    ax1.set_xlabel("FFT bin")
    ax1.set_ylabel("mean periodogram (dB)")
    ax1.set_title("PSD match (closer to clean = better)")
    ax1.grid(alpha=0.25, lw=0.5)
    ax1.legend(frameon=False, fontsize=9)

    bins = np.linspace(0, 1.0, 80)
    for label, x in frames.items():
        amp = np.abs(np.asarray(x)).ravel()
        hist, edges = np.histogram(amp, bins=bins, density=True)
        ls = "--" if label == "clean" else "-"
        lw = 2.2 if label == "clean" else 1.8
        ax2.plot(0.5 * (edges[:-1] + edges[1:]), hist, ls,
                 color=COLORS[label], lw=lw, label=label)
    ax2.set_xlabel("per-sample |I/Q| amplitude")
    ax2.set_ylabel("density")
    ax2.set_title("Amplitude distribution (regression-to-mean shows here)")
    ax2.grid(alpha=0.25, lw=0.5)

    fig.suptitle("Adversarial value, mini nonlinear task: what each "
                 "training objective does to the output distribution",
                 fontsize=11)
    fig.tight_layout(rect=(0, 0, 1, 0.95))
    out = Path("results/distributional_psd_mini.png")
    fig.savefig(out, dpi=150)
    print("wrote", out)


if __name__ == "__main__":
    main()
