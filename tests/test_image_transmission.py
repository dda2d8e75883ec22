"""Image-over-OFDM transmission tests: lossless high-SNR path, metric
monotonicity, real-GAN enhancement column, and figure artifacts."""

import json
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ofdmgan_tpu.viz.image_transmission import (
    ImageOFDMSimulator, _test_image, generate_transmission_figures, patterns_3x3,
)


class TestSimulator:
    def test_lossless_at_high_snr(self):
        sim = ImageOFDMSimulator(channel_type="awgn")
        img = _test_image()
        recon, _, _ = sim.transmit(img, 60.0)
        np.testing.assert_array_equal(recon, img)

    def test_metrics_degrade_with_noise(self):
        sim = ImageOFDMSimulator(channel_type="awgn")
        res = sim.evaluate(_test_image(), [0.0, 30.0])
        by_snr = {r.snr_db: r for r in res}
        assert by_snr[30.0].psnr_db > by_snr[0.0].psnr_db
        assert by_snr[30.0].ber <= by_snr[0.0].ber
        assert by_snr[30.0].ssim > by_snr[0.0].ssim

    def test_real_gan_enhancement_column(self):
        from ofdmgan_tpu.models import MiniGenerator

        gen = MiniGenerator()
        params = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 2)))
        sim = ImageOFDMSimulator(channel_type="awgn", gen_apply=gen.apply,
                                 gen_params=params)
        res = sim.evaluate(_test_image(), [10.0])
        assert res[0].enhanced_psnr_db is not None
        assert np.isfinite(res[0].enhanced_psnr_db)

    def test_patterns(self):
        p = patterns_3x3()
        assert set(p) == {"circle", "cross"}
        assert p["circle"].dtype == np.uint8 and p["circle"].shape == (3, 3)


class TestFigures:
    def test_figure_driver(self, tmp_path):
        res = generate_transmission_figures(
            output_dir=str(tmp_path), snr_values=(0.0, 20.0)
        )
        assert set(res) == {"awgn", "rayleigh", "rician"}
        for f in ("metrics_vs_snr.png", "transmission_pipeline.png",
                  "constellation_heatmap.png", "simplegan_patterns.png",
                  "transmission_metrics.json"):
            assert (tmp_path / f).exists(), f
        data = json.loads((tmp_path / "transmission_metrics.json").read_text())
        assert len(data["awgn"]) == 2


def test_full_pipeline_cross_figure(tmp_path):
    """The reference-parity cross-section panel renders and reports metrics
    (image_ofdm_visualization.py:489-653); without a generator the enhanced
    column degenerates to the noisy one."""
    from ofdmgan_tpu.viz.image_transmission import create_full_pipeline_cross_figure

    out = tmp_path / "cross.png"
    m = create_full_pipeline_cross_figure(output_path=str(out), snr_db=10.0,
                                          channel_type="awgn")
    assert out.exists() and out.stat().st_size > 10_000
    for k in ("psnr_noisy", "psnr_enhanced", "ssim_noisy", "nmse_enhanced"):
        assert k in m
    assert m["psnr_noisy"] == m["psnr_enhanced"]  # no generator passed
