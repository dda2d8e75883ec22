"""RTL ground-truth cross-check: the reference's own recorded Icarus
Verilog runs (checked-in .vcd dumps) versus our engines.

This is the suite's strongest evidence on the "bit-true" claim: the
as-built cycle model (verify/rtl_cycle_model.py) must reproduce every
output word the reference RTL produced under the reference author's own
simulator, and the documented-datapath engines (intsim/fixsim) must
agree with each other on the same recorded inputs. See
scripts/vcd_crosscheck.py for the full evidence chain.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
REF_RTL = Path("/root/reference/rtl/ofdmGAN")

needs_reference = pytest.mark.skipif(
    not (REF_RTL / "tb_generator_mini.vcd").exists(),
    reason="reference VCD dumps not mounted")


def test_to_signed():
    from ofdmgan_tpu.verify.vcd import to_signed
    assert to_signed(0x7FFF, 16) == 32767
    assert to_signed(0x8000, 16) == -32768
    assert to_signed(0xFFFF, 16) == -1
    assert to_signed(0x1FFFF, 16) == -1  # masked to width
    assert to_signed(None, 16) is None


@needs_reference
def test_vcd_header_and_posedge_sampling():
    from ofdmgan_tpu.verify.vcd import VCD
    vcd = VCD(str(REF_RTL / "tb_generator_mini.vcd"))
    assert vcd.width_of("tb_generator_mini.data_out") == 16
    assert vcd.width_of("tb_generator_mini.clk") == 1
    # the DUT hierarchy is dumped too ($dumpvars depth 0)
    assert "tb_generator_mini.dut.weight_addr_k0" in vcd.vars
    # first few posedges exist and carry reset low then high
    it = vcd.posedge_samples("tb_generator_mini.clk",
                             {"rst_n": "tb_generator_mini.rst_n"})
    t0, pre, post = next(it)
    assert post["rst_n"] in (0, None)


@needs_reference
def test_full_crosscheck_all_required_checks_pass(tmp_path):
    """Run the complete evidence chain; every required check must pass
    and the known documented-vs-as-built divergence must be recorded."""
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "vcd_crosscheck.py")],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    report = json.loads((REPO / "results" / "vcd_crosscheck.json").read_text())
    assert report["ok"] is True
    for name, chk in report["checks"].items():
        assert chk["pass"], name
    div = report["divergence"]
    # the as-built RTL computes a DIFFERENT function than the documented
    # datapath — a stable, reproducible finding
    assert div["generator_documented_vs_asbuilt"]["mismatching_words"] > 0
    assert div["discriminator_documented_vs_asbuilt"]["rtl_scores"] == [-4] * 5


@needs_reference
def test_cycle_model_generator_matches_recorded_rtl():
    """Direct (non-subprocess) validation of the as-built generator model
    on the first three recorded testbench transactions."""
    from ofdmgan_tpu.quant.rom_codegen import parse_rom_verilog
    from ofdmgan_tpu.verify.rtl_cycle_model import GeneratorMiniRTL
    from ofdmgan_tpu.verify.vcd import Stream, extract_transactions

    tests = extract_transactions(
        str(REF_RTL / "tb_generator_mini.vcd"), "tb_generator_mini",
        [Stream("data_in", "valid_in", "ready_in")],
        "data_out", "valid_out", "ready_out", out_cap=32)
    rom_w, rom_b = parse_rom_verilog(str(REF_RTL / "weight_rom.v"))
    model = GeneratorMiniRTL(rom_w, rom_b)
    for t in range(3):
        out = model.run_frame(tests[t]["data_in"])
        assert out == tests[t]["data_out"], f"test {t + 1}"
