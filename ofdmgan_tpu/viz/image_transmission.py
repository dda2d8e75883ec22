"""Image-over-OFDM transmission simulation + figures (the JSCC study).

Behavioral parity target: reference visualization/image_ofdm_visualization.py
(ImageOFDMSimulator, PSNR/SSIM/NMSE metrics, constellation heatmaps, SNR
sweeps, 3x3-pattern transmission pipeline figures, lines 74-959).

Key upgrade over the reference: its "GAN enhancement" column was FAKED with
a noise-reduction heuristic (simulate_gan_enhancement,
image_ofdm_visualization.py:224-251 — documented quirk, SURVEY.md §4.7);
here the enhancement column runs the REAL trained generator frame-by-frame
over the transmitted signal.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..eval.metrics import nmse as _nmse, psnr as _psnr, ssim_global as _ssim
from ..signal import image_ofdm
from ..signal.channel import ChannelConfig
from ..utils.iq import complex_to_iq, iq_to_complex


@dataclasses.dataclass
class TransmissionResult:
    snr_db: float
    channel: str
    psnr_db: float
    ssim: float
    nmse: float
    ber: float
    enhanced_psnr_db: Optional[float] = None
    enhanced_ssim: Optional[float] = None


def patterns_3x3() -> Dict[str, np.ndarray]:
    """The simpleGAN 3x3 test patterns as 0..255 images
    (image_ofdm_visualization.py:713-753 generate_simplegan_patterns)."""
    circle = np.array([[1, 1, 1], [1, -1, 1], [1, 1, 1]], np.float32)
    cross = np.array([[-1, 1, -1], [1, 1, 1], [-1, 1, -1]], np.float32)
    return {k: ((v + 1) * 127.5).astype(np.uint8) for k, v in
            {"circle": circle, "cross": cross}.items()}


class ImageOFDMSimulator:
    """End-to-end image transmission: image -> bits -> QAM -> OFDM ->
    channel -> (optional GAN enhancement) -> demod -> image
    (image_ofdm_visualization.py:143-311)."""

    def __init__(
        self,
        modulation: str = "QAM16",
        n_subcarriers: int = 64,
        cp_length: int = 16,
        frame_length: int = 1024,
        channel_type: str = "awgn",
        gen_apply=None,
        gen_params=None,
        gen_frame: int = 16,
    ):
        self.cfg = image_ofdm.ImageOFDMConfig(
            modulation, n_subcarriers, cp_length, frame_length
        )
        self.channel = ChannelConfig(channel_type)
        self.gen_apply = gen_apply
        self.gen_params = gen_params
        self.gen_frame = gen_frame

    def _enhance(self, iq: np.ndarray) -> np.ndarray:
        """Run the trained generator over the whole signal in gen_frame
        chunks (REAL enhancement, not the reference's heuristic)."""
        import jax.numpy as jnp

        l = iq.shape[0]
        f = self.gen_frame
        pad = (-l) % f
        x = np.pad(iq, ((0, pad), (0, 0))).reshape(-1, f, 2)
        m = np.abs(x).reshape(x.shape[0], -1).max(1)[:, None, None]
        m = np.maximum(m, 1e-9)
        y = np.asarray(self.gen_apply(self.gen_params, jnp.asarray(x / m)))
        return (y * m).reshape(-1, 2)[:l]

    def transmit(self, image: np.ndarray, snr_db: float, seed: int = 0,
                 enhance: bool = False):
        import jax

        iq, meta = image_ofdm.image_to_ofdm(image, self.cfg)
        sig = np.asarray(iq_to_complex(iq * meta["normalization_factor"]))
        from ..signal import channel as channel_lib
        import jax.numpy as jnp

        rx, _ = channel_lib.apply(
            jax.random.PRNGKey(seed), jnp.asarray(sig), jnp.float32(snr_db), self.channel
        )
        rx_iq = np.asarray(complex_to_iq(rx), np.float32)
        if enhance and self.gen_apply is not None:
            rx_iq = self._enhance(rx_iq)
        # rx_iq is at physical constellation scale already (we multiplied the
        # normalization factor back in before the channel), so no denorm here
        recon = image_ofdm.ofdm_to_image(rx_iq, meta["original_shape"], self.cfg)
        return recon, rx_iq, meta

    def evaluate(self, image: np.ndarray, snr_values: List[float],
                 seed: int = 0) -> List[TransmissionResult]:
        results = []
        bits_ref = np.unpackbits(image_ofdm.to_grayscale(image).flatten())
        for i, snr in enumerate(snr_values):
            recon, _, _ = self.transmit(image, snr, seed + i)
            bits_rx = np.unpackbits(recon.astype(np.uint8).flatten())[: bits_ref.size]
            res = TransmissionResult(
                snr_db=float(snr),
                channel=self.channel.kind,
                psnr_db=float(_psnr(recon, image_ofdm.to_grayscale(image))),
                ssim=float(_ssim(recon, image_ofdm.to_grayscale(image))),
                nmse=float(_nmse(recon.astype(np.float32),
                                 image_ofdm.to_grayscale(image).astype(np.float32))),
                ber=float(np.mean(bits_rx != bits_ref)),
            )
            if self.gen_apply is not None:
                recon_e, _, _ = self.transmit(image, snr, seed + i, enhance=True)
                res.enhanced_psnr_db = float(_psnr(recon_e, image_ofdm.to_grayscale(image)))
                res.enhanced_ssim = float(_ssim(recon_e, image_ofdm.to_grayscale(image)))
            results.append(res)
        return results


def generate_transmission_figures(
    output_dir: str = "docs/figures/ofdm_transmission",
    gen_apply=None,
    gen_params=None,
    snr_values=(0.0, 5.0, 10.0, 15.0, 20.0, 25.0),
    seed: int = 0,
) -> Dict:
    """The figure/artifact driver (image_ofdm_visualization.py:760-959):
    pattern transmissions over AWGN/Rayleigh/Rician, metric-vs-SNR sweeps,
    constellation heatmaps, and a JSON metrics dump."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    test_img = _test_image()
    all_results: Dict[str, List[Dict]] = {}

    for ch in ("awgn", "rayleigh", "rician"):
        sim = ImageOFDMSimulator(channel_type=ch, gen_apply=gen_apply,
                                 gen_params=gen_params)
        res = sim.evaluate(test_img, list(snr_values), seed)
        all_results[ch] = [dataclasses.asdict(r) for r in res]

    # metric sweeps
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    for ch, rows in all_results.items():
        snrs = [r["snr_db"] for r in rows]
        axes[0].plot(snrs, [r["psnr_db"] for r in rows], "o-", label=ch)
        axes[1].plot(snrs, [r["ssim"] for r in rows], "o-", label=ch)
        axes[2].semilogy(snrs, [max(r["ber"], 1e-6) for r in rows], "o-", label=ch)
    for ax, t in zip(axes, ("PSNR (dB)", "SSIM", "BER")):
        ax.set_xlabel("SNR (dB)")
        ax.set_title(t)
        ax.grid(alpha=0.3)
        ax.legend()
    fig.tight_layout()
    fig.savefig(out / "metrics_vs_snr.png", dpi=130)
    plt.close(fig)

    # pipeline figure: original / received / (enhanced) at a mid SNR
    sim = ImageOFDMSimulator(channel_type="awgn", gen_apply=gen_apply,
                             gen_params=gen_params)
    recon, rx_iq, _ = sim.transmit(test_img, 10.0, seed)
    cols = 3 if gen_apply is not None else 2
    fig, axes = plt.subplots(1, cols, figsize=(3 * cols, 3.2))
    axes[0].imshow(image_ofdm.to_grayscale(test_img), cmap="gray")
    axes[0].set_title("original")
    axes[1].imshow(recon, cmap="gray")
    axes[1].set_title("received @10dB")
    if gen_apply is not None:
        recon_e, _, _ = sim.transmit(test_img, 10.0, seed, enhance=True)
        axes[2].imshow(recon_e, cmap="gray")
        axes[2].set_title("GAN-enhanced")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out / "transmission_pipeline.png", dpi=130)
    plt.close(fig)

    # constellation heatmap of the received signal
    rx_c = rx_iq[:, 0] + 1j * rx_iq[:, 1]
    fig, ax = plt.subplots(figsize=(4.2, 4))
    ax.hist2d(rx_c.real, rx_c.imag, bins=60, cmap="viridis")
    ax.set_xlabel("I")
    ax.set_ylabel("Q")
    ax.set_title("received constellation density @10dB")
    fig.tight_layout()
    fig.savefig(out / "constellation_heatmap.png", dpi=130)
    plt.close(fig)

    # simpleGAN 3x3 pattern transmissions
    pats = patterns_3x3()
    fig, axes = plt.subplots(2, len(pats) + 1, figsize=(3 * (len(pats) + 1), 6))
    sim_small = ImageOFDMSimulator(
        modulation="QPSK", n_subcarriers=8, cp_length=2, frame_length=64,
        channel_type="awgn",
    )
    for j, (name, img) in enumerate(pats.items()):
        axes[0, j].imshow(img, cmap="gray", vmin=0, vmax=255)
        axes[0, j].set_title(f"{name} (tx)")
        recon_p, _, _ = sim_small.transmit(img, 10.0, seed + j)
        axes[1, j].imshow(recon_p, cmap="gray", vmin=0, vmax=255)
        axes[1, j].set_title(f"{name} (rx @10dB)")
    axes[0, -1].axis("off")
    axes[1, -1].axis("off")
    for ax in axes.flat:
        ax.set_xticks([])
        ax.set_yticks([])
    fig.tight_layout()
    fig.savefig(out / "simplegan_patterns.png", dpi=130)
    plt.close(fig)

    (out / "transmission_metrics.json").write_text(json.dumps(all_results, indent=2))
    return all_results


def create_full_pipeline_cross_figure(
    output_path: str = "docs/figures/ofdm_transmission/full_pipeline_cross.png",
    gen_apply=None,
    gen_params=None,
    gen_frame: int = 16,
    snr_db: float = 10.0,
    channel_type: str = "rayleigh",
    seed: int = 0,
) -> Dict:
    """Full transmission cross-section panel — parity with the reference's
    full_pipeline_cross.png (image_ofdm_visualization.py:489-653): the 3x3
    cross pattern through image -> QPSK -> OFDM -> channel, showing the
    original/noisy/enhanced images (pixel-annotated), TX/RX constellations,
    constellation density heatmaps, and a PSNR/SSIM/NMSE metrics box. The
    enhancement column runs the REAL trained generator (the reference faked
    it with a noise-reduction heuristic, lines 224-251).

    Returns the metrics dict (also drawn into the figure).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.gridspec as gridspec
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from ..signal import ofdm, qam

    img = patterns_3x3()["cross"]
    sim = ImageOFDMSimulator(
        modulation="QPSK", n_subcarriers=8, cp_length=2, frame_length=64,
        channel_type=channel_type, gen_apply=gen_apply, gen_params=gen_params,
        gen_frame=gen_frame,
    )
    recon_n, rx_iq_n, meta = sim.transmit(img, snr_db, seed)
    have_gan = gen_apply is not None
    if have_gan:
        recon_e, rx_iq_e, _ = sim.transmit(img, snr_db, seed, enhance=True)
    else:
        recon_e, rx_iq_e = recon_n, rx_iq_n

    spec = ofdm.OFDMSpec(sim.cfg.n_subcarriers, sim.cfg.cp_length)
    bits = np.unpackbits(image_ofdm.to_grayscale(img).flatten())
    tx_sym = np.asarray(qam.modulate(jnp.asarray(bits), "QPSK"))

    def rx_symbols(iq):
        sig = np.asarray(iq_to_complex(jnp.asarray(iq)))
        sym, _ = ofdm.demodulate(jnp.asarray(sig), spec)
        return np.asarray(sym)[: tx_sym.size]

    rx_sym_n, rx_sym_e = rx_symbols(rx_iq_n), rx_symbols(rx_iq_e)

    gray = image_ofdm.to_grayscale(img)
    m = {
        "psnr_noisy": float(_psnr(recon_n, gray)),
        "psnr_enhanced": float(_psnr(recon_e, gray)),
        "ssim_noisy": float(_ssim(recon_n, gray)),
        "ssim_enhanced": float(_ssim(recon_e, gray)),
        "nmse_noisy": float(_nmse(recon_n.astype(np.float32), gray.astype(np.float32))),
        "nmse_enhanced": float(_nmse(recon_e.astype(np.float32), gray.astype(np.float32))),
    }

    def annotate(ax, image):
        for i in range(image.shape[0]):
            for j in range(image.shape[1]):
                v = int(image[i, j])
                ax.text(j, i, str(v), ha="center", va="center", fontsize=7,
                        color="yellow" if v < 128 else "black")

    def constellation(ax, sym, color, title, ref=True):
        if ref:
            ax.scatter(tx_sym.real, tx_sym.imag, c="blue", s=40, alpha=0.3,
                       marker="x")
        ax.scatter(sym.real, sym.imag, c=color, s=70, alpha=0.6,
                   edgecolors="white", linewidth=0.8)
        ax.axhline(0, color="gray", ls="--", lw=0.5)
        ax.axvline(0, color="gray", ls="--", lw=0.5)
        ax.set_xlabel("I")
        ax.set_ylabel("Q")
        ax.set_title(title, fontweight="bold", fontsize=10)
        ax.set_aspect("equal")
        ax.grid(alpha=0.3)

    def heatmap(ax, sym, title, cmap):
        r = max(1.5, float(np.abs(sym).max()) * 1.15)
        ax.hist2d(sym.real, sym.imag, bins=30,
                  range=[[-r, r], [-r, r]], cmap=cmap)
        ax.axhline(0, color="white", lw=0.5, alpha=0.5)
        ax.axvline(0, color="white", lw=0.5, alpha=0.5)
        ax.set_xlabel("I")
        ax.set_ylabel("Q")
        ax.set_title(title, fontweight="bold", fontsize=10)
        ax.set_aspect("equal")

    fig = plt.figure(figsize=(16, 10))
    gs = gridspec.GridSpec(3, 5, figure=fig)

    ax = fig.add_subplot(gs[0, 0])
    ax.imshow(gray, cmap="RdBu_r", vmin=0, vmax=255)
    ax.set_title("Original\n(Source Image)", fontweight="bold", fontsize=10)
    ax.axis("off")
    annotate(ax, gray)

    constellation(fig.add_subplot(gs[0, 1]), tx_sym, "blue",
                  "TX Symbols\n(Before Channel)", ref=False)
    constellation(fig.add_subplot(gs[0, 2]), rx_sym_n, "red",
                  f"RX Symbols (Noisy)\n{channel_type}, SNR={snr_db:g} dB")
    constellation(fig.add_subplot(gs[0, 3]), rx_sym_e, "green",
                  "RX Symbols\n(GAN Enhanced)" if have_gan
                  else "RX Symbols\n(no enhancement)")

    ax = fig.add_subplot(gs[0, 4])
    ax.axis("off")
    txt = (f"Quality Metrics\n{'=' * 15}\n\nBefore GAN:\n{'-' * 13}\n"
           f"PSNR: {m['psnr_noisy']:.2f} dB\nSSIM: {m['ssim_noisy']:.4f}\n"
           f"NMSE: {m['nmse_noisy']:.4f}\n\nAfter GAN:\n{'-' * 13}\n"
           f"PSNR: {m['psnr_enhanced']:.2f} dB\nSSIM: {m['ssim_enhanced']:.4f}\n"
           f"NMSE: {m['nmse_enhanced']:.4f}\n\nImprovement:\n{'-' * 13}\n"
           f"dPSNR: {m['psnr_enhanced'] - m['psnr_noisy']:+.2f} dB\n"
           f"dSSIM: {m['ssim_enhanced'] - m['ssim_noisy']:+.4f}")
    ax.text(0.05, 0.95, txt, transform=ax.transAxes, fontsize=9,
            family="monospace", va="top",
            bbox=dict(boxstyle="round", facecolor="lightgray", alpha=0.8))

    ax = fig.add_subplot(gs[1, 0])
    ax.imshow(recon_n, cmap="RdBu_r", vmin=0, vmax=255)
    ax.set_title(f"Noisy Recon\nPSNR: {m['psnr_noisy']:.1f} dB",
                 fontweight="bold", fontsize=10)
    ax.axis("off")
    annotate(ax, recon_n)

    ax = fig.add_subplot(gs[2, 0])
    ax.imshow(recon_e, cmap="RdBu_r", vmin=0, vmax=255)
    ax.set_title(f"Enhanced Recon\nPSNR: {m['psnr_enhanced']:.1f} dB",
                 fontweight="bold", fontsize=10)
    ax.axis("off")
    annotate(ax, recon_e)

    heatmap(fig.add_subplot(gs[1:, 1:3]), rx_sym_n,
            "Noisy Channel Constellation Density", "hot")
    heatmap(fig.add_subplot(gs[1:, 3:5]), rx_sym_e,
            "GAN Enhanced Constellation Density" if have_gan
            else "Constellation Density (no enhancement)", "viridis")

    fig.suptitle(f"Image Transmission over OFDM Channel\n"
                 f"({channel_type.upper()}, SNR = {snr_db:g} dB)",
                 fontsize=14, fontweight="bold", y=0.99)
    fig.tight_layout(rect=[0, 0, 1, 0.94])
    out = Path(output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out, dpi=150, bbox_inches="tight", facecolor="white")
    plt.close(fig)
    return m


def _test_image(size: int = 16) -> np.ndarray:
    """Deterministic structured grayscale test image (gradient + checker)."""
    y, x = np.mgrid[0:size, 0:size]
    img = (x * 255 / (size - 1) * 0.5 + ((x // 4 + y // 4) % 2) * 127).astype(np.uint8)
    return img
