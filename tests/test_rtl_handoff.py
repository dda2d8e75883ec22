"""RTL-residual handoff bundle (scripts/make_rtl_handoff.py): the committed
$readmemh vectors must be reproducible and consistent with both integer
engines, and the generated ROM must parse back to the champion's Q1.7/Q8.8
quantization (the reference's final hop — running them through iverilog —
needs a Verilog simulator this environment lacks; see
docs/rtl_residual_datapath.md)."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
BUNDLE = REPO / "rtl" / "handoff_rtl_residual"
CKPT = REPO / "results" / "residual_checkpoints" / "rtl_qat" / "champion_params_g.npz"


@pytest.fixture(scope="module")
def champion_params():
    from scripts.make_rtl_handoff import load_npz_params

    return load_npz_params(str(CKPT))


def test_committed_vectors_match_intsim(champion_params):
    from ofdmgan_tpu.quant import intsim
    from ofdmgan_tpu.verify.golden import read_hex
    from scripts.make_rtl_handoff import make_test_frames

    ip = intsim.quantize_weights_rtl(champion_params, "generator")
    manifest = json.loads((BUNDLE / "manifest.json").read_text())
    frames = make_test_frames()
    assert set(manifest["vectors"]) == set(frames)
    for name, frame in frames.items():
        xq = np.asarray(intsim.float_to_q88(frame[None].astype(np.float32)))
        yq = np.asarray(intsim.generator_int_forward(ip, xq, "rtl_residual"))
        in_hex = read_hex(BUNDLE / "vectors" / f"{name}_in.hex")
        out_hex = read_hex(BUNDLE / "vectors" / f"{name}_out.hex")
        np.testing.assert_array_equal(in_hex, xq[0].T.flatten().astype(np.int16))
        np.testing.assert_array_equal(out_hex, yq[0].T.flatten().astype(np.int16))


def test_committed_vectors_match_native_fixsim(champion_params):
    """Independent C++ engine agrees with every committed expected output."""
    from ofdmgan_tpu.quant import intsim
    from ofdmgan_tpu.verify import cosim
    from ofdmgan_tpu.verify.golden import read_hex
    from scripts.make_rtl_handoff import make_test_frames

    if not cosim.available():
        pytest.skip("native fixsim engine unavailable")
    from ofdmgan_tpu.quant.rom_codegen import pack_rom_arrays

    rom_w, rom_b = pack_rom_arrays(champion_params, None, int_source="q17")
    for name, frame in make_test_frames().items():
        xq = np.asarray(intsim.float_to_q88(frame[None].astype(np.float32)))
        x_ncl = np.ascontiguousarray(np.transpose(xq, (0, 2, 1)).astype(np.int16))
        y_cpp = cosim.generator_forward(rom_w, rom_b, x_ncl, residual=True)
        out_hex = read_hex(BUNDLE / "vectors" / f"{name}_out.hex")
        np.testing.assert_array_equal(out_hex, y_cpp[0].flatten())


def test_rom_parses_back_to_champion_quantization(champion_params):
    from ofdmgan_tpu.quant import intsim
    from ofdmgan_tpu.quant.rom_codegen import pack_rom_arrays, parse_rom_verilog

    weights, biases = parse_rom_verilog(str(REPO / "rtl" / "weight_rom_rtl_residual.v"))
    ref_w, ref_b = pack_rom_arrays(champion_params, None, int_source="q17")
    np.testing.assert_array_equal(weights, ref_w.astype(np.int32))
    np.testing.assert_array_equal(biases, ref_b.astype(np.int32))
    # sanity: ROM not empty, weights within Q1.7
    assert np.abs(weights).sum() > 0
    ip = intsim.quantize_weights_rtl(champion_params, "generator")
    assert int(np.abs(np.asarray(ip.enc1.weight)).max()) <= 127


def test_hex_rom_images_match_verilog_rom():
    from ofdmgan_tpu.quant.rom_codegen import parse_rom_verilog

    weights, biases = parse_rom_verilog(str(REPO / "rtl" / "weight_rom_rtl_residual.v"))
    w_img = np.array([int(l, 16) for l in (BUNDLE / "weights.hex").read_text().split()])
    b_img = np.array([int(l, 16) for l in (BUNDLE / "biases.hex").read_text().split()])
    w_img = np.where(w_img >= 128, w_img - 256, w_img)
    b_img = np.where(b_img >= 32768, b_img - 65536, b_img)
    np.testing.assert_array_equal(weights, w_img)
    np.testing.assert_array_equal(biases, b_img)


def test_regeneration_is_deterministic(tmp_path):
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_rtl_handoff.py"),
         "--out_dir", str(tmp_path / "bundle"),
         "--rom_file", str(tmp_path / "rom.v")],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    new = json.loads((tmp_path / "bundle" / "manifest.json").read_text())
    old = json.loads((BUNDLE / "manifest.json").read_text())
    assert new["vectors"] == old["vectors"]
