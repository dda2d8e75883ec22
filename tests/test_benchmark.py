"""Benchmark harness tests: structure, oracle sanity (ZF near-perfect, NoEQ
MSE tracks SNR), and plotting smoke."""

import numpy as np
import jax
import jax.numpy as jnp

from ofdmgan_tpu.eval.benchmark import (
    degradation_summary, plot_benchmark_results, print_results_table, run_benchmark,
)
from ofdmgan_tpu.models import MiniGenerator

KEY = jax.random.PRNGKey(0)


def _gen():
    g = MiniGenerator()
    p = g.init(KEY, jnp.zeros((1, 16, 2)))
    return g, p


class TestBenchmark:
    def test_structure_and_sanity(self):
        g, p = _gen()
        snrs = [0.0, 15.0, 30.0]
        res = run_benchmark(g.apply, p, n_trials=16, snr_values=snrs)
        assert set(res) == {"GAN", "ZF", "MMSE", "Wiener", "DFE", "LMS", "RLS", "NoEQ"}
        # Wiener is the optimal linear AWGN estimator: must beat NoEQ
        assert res["Wiener"][0.0]["mse"] < res["NoEQ"][0.0]["mse"]
        for m in res:
            for s in snrs:
                assert {"mse", "mse_std", "evm", "evm_std"} <= set(res[m][s])
        # NoEQ MSE decreases with SNR
        assert res["NoEQ"][30.0]["mse"] < res["NoEQ"][0.0]["mse"]
        # oracle-channel ZF is near-perfect at any SNR
        assert res["ZF"][0.0]["mse"] < 1e-4
        # EVM decreases with SNR for NoEQ
        assert res["NoEQ"][30.0]["evm"] < res["NoEQ"][0.0]["evm"]

    def test_nonlinear_floor(self):
        # With impairments, NoEQ error floors at high SNR well above linear.
        g, p = _gen()
        snrs = [30.0]
        lin = run_benchmark(g.apply, p, n_trials=16, snr_values=snrs, nonlinear=False)
        nl = run_benchmark(g.apply, p, n_trials=16, snr_values=snrs,
                           nonlinear=True, pa_saturation=0.8)
        assert nl["NoEQ"][30.0]["mse"] > 3 * lin["NoEQ"][30.0]["mse"]

    def test_no_gan_mode(self):
        res = run_benchmark(None, None, n_trials=4, snr_values=[10.0])
        assert "GAN" not in res and "ZF" in res

    def test_tables_and_plots(self, tmp_path, capsys):
        g, p = _gen()
        snrs = [0.0, 30.0]
        res = run_benchmark(g.apply, p, n_trials=4, snr_values=snrs)
        print_results_table(res, snrs, "test")
        captured = capsys.readouterr().out
        assert "Improvement over No Equalization" in captured
        plot_benchmark_results(res, snrs, "(test)", tmp_path / "plot.png")
        assert (tmp_path / "plot.png").stat().st_size > 10_000
        degradation_summary(res, res, snrs)

    def test_pilot_protocol_is_honest(self):
        """Round-2 fair protocol: no equalizer sees the clean data frame.
        Invariants: oracle ZF is unbeatable-by-construction (exact inversion
        of the very frame it's estimating from); pilot ZF/MMSE are
        estimation-noise-limited but still clearly beat NoEQ on a fading
        channel and improve with SNR."""
        snrs = [10.0, 30.0]
        pil = run_benchmark(None, None, n_trials=32, snr_values=snrs,
                            channel_type="rayleigh", protocol="pilot", seed=1)
        ora = run_benchmark(None, None, n_trials=32, snr_values=snrs,
                            channel_type="rayleigh", protocol="oracle", seed=1)
        for m in ("ZF", "MMSE"):
            # oracle advantage exists and is large
            assert ora[m][30.0]["mse"] < pil[m][30.0]["mse"] / 10
            # but pilot estimation still equalizes the fade
            assert pil[m][30.0]["mse"] < pil["NoEQ"][30.0]["mse"] / 10
            # and sharpens with SNR (estimation noise shrinks)
            assert pil[m][30.0]["mse"] < pil[m][10.0]["mse"] / 3
        # adaptive equalizers trained on the preamble alone stay finite and
        # no better than their oracle-trained counterparts
        import numpy as np
        for m in ("DFE", "LMS", "RLS"):
            assert np.isfinite(pil[m][30.0]["mse"])
            assert pil[m][30.0]["mse"] > ora[m][30.0]["mse"] * 0.8
