"""Viz + cosim-report tests: diagram emission, signal figures, scenario
verification suite with JSON + dashboard artifacts."""

import json
from pathlib import Path

import numpy as np
import pytest

from ofdmgan_tpu.viz import diagrams, signal_viz
from ofdmgan_tpu.verify.cosim_report import run_cosim_verification


class TestDiagrams:
    def test_all_diagrams_emitted(self, tmp_path):
        written = diagrams.generate_all_diagrams(str(tmp_path))
        assert len(written) == 12  # 6 diagrams x (.dot + .png)
        dot = (tmp_path / "generator_detailed.dot").read_text()
        assert "digraph" in dot and "Enc1" in dot and "Skip" in dot
        assert (tmp_path / "training_flow.png").stat().st_size > 5_000


class TestSignalViz:
    def test_scenarios_and_figures(self, tmp_path):
        g = signal_viz.OFDMSignalGenerator(seed=1)
        clean = g.clean_frame()
        assert clean.i.shape == (16,)
        assert abs(np.max(np.abs(clean.complex)) - 1.0) < 1e-6
        faded = g.add_deep_fade(clean, 60.0, 4, 8)
        np.testing.assert_allclose(faded.complex[4:8], clean.complex[4:8] * 0.4, rtol=1e-6)
        burst = g.add_burst_interference(clean)
        assert np.any(burst.complex[8:12] != clean.complex[8:12])

        viz = signal_viz.OFDMVisualizer(str(tmp_path))
        p1 = viz.plot_time_domain([clean, faded])
        p2 = viz.plot_constellation([clean, faded])
        p3 = viz.plot_psd([clean, faded])
        p4 = viz.plot_spectrogram([clean, faded])
        for p in (p1, p2, p3, p4):
            assert Path(p).stat().st_size > 5_000

    def test_research_figures_with_live_datapath(self, tmp_path):
        out = signal_viz.create_research_quality_figures(output_dir=str(tmp_path))
        rows = out["scenarios"]
        assert len(rows) == 5
        names = {r["scenario"] for r in rows}
        assert names == {"awgn_30", "deep_fade_60", "burst", "freq_selective", "worst_case"}
        for r in rows:
            assert np.isfinite(r["mse_enhanced_int"])
        data = json.loads((tmp_path / "scenario_results.json").read_text())
        assert len(data) == 5


class TestCosimReport:
    def test_full_suite(self, tmp_path):
        res = run_cosim_verification(output_dir=str(tmp_path))
        assert res["total_tests"] == 6 + 5 + 5 + 1  # patterns + ofdm + disc + system
        assert res["passed_tests"] == res["total_tests"], [
            t for t in res["tests"] if not t["passed"]
        ]
        j = json.loads((tmp_path / "cosim_verification_results.json").read_text())
        assert j["passed_tests"] == j["total_tests"]
        assert (tmp_path / "cosim_dashboard.png").stat().st_size > 5_000
        if res["native_engine"]:
            assert all(t.get("native_bitexact", True) for t in res["tests"])
