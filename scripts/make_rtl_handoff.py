#!/usr/bin/env python3
"""RTL-residual deployment handoff bundle generator.

No Verilog simulator exists in this environment (`which iverilog vvp
verilator` -> nothing), so the reference's final validation hop — running
the generated ROMs through its own testbenches
(/root/reference/visualization/rtl_verification_viz.py:62-105,
/root/reference/rtl/ofdmGAN/Makefile:20-105) — cannot be executed here.
This script produces everything a hardware engineer with a simulator needs
to close that loop for the shipped RTL-residual datapath:

  * rtl/weight_rom_rtl_residual.v — weight/bias ROM source generated from
    the trained RTL-residual QAT champion
    (results/residual_checkpoints/rtl_qat/), same address map as
    rtl/ofdmGAN/weight_rom.v:27-39;
  * rtl/handoff_rtl_residual/weights.hex, biases.hex — the same ROM images
    as flat ``$readmemh`` memories (2048 x 8-bit Q1.7 / 64 x 16-bit Q8.8);
  * rtl/handoff_rtl_residual/vectors/<name>_{in,out}.hex — input frames and
    bit-true expected outputs (Q8.8, 4-hex-digit two's complement, one word
    per line, channel-first: 16 I samples then 16 Q samples — the golden-
    vector convention of proof/verification.py:297-312) across the reference
    testbench's pattern set (tb_generator_mini.v:214-430) plus OFDM frames;
  * rtl/handoff_rtl_residual/manifest.json — scenario inventory + CRC32s.

Expected outputs come from quant/intsim.py mode "rtl_residual", which is
bit-exact against the independent C++ engine native/fixsim.cpp
(tests/test_cosim.py) — two implementations agree on every vector, so a
third (Verilog) disagreeing would localize a real divergence.
"""

import argparse
import json
import sys
import zlib
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_npz_params(path: str):
    import numpy as np

    flat = np.load(path)
    params = {}
    for p, arr in flat.items():
        node, keys = params, p.split("/")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = arr
    return params


def make_test_frames(frame_length: int = 16):
    """Pattern set mirroring tb_generator_mini.v:214-430 (zero / DC /
    impulse / sine / ramp) plus QPSK-OFDM scenarios at several SNRs.
    Returns dict name -> float frame [L, 2]."""
    import numpy as np

    L = frame_length
    rng = np.random.default_rng(42)
    t = np.arange(L)
    frames = {
        "zero": np.zeros((L, 2)),
        "dc": np.full((L, 2), 0.5),
        "impulse": np.zeros((L, 2)),
        "sine": np.stack([0.7 * np.sin(2 * np.pi * t / L),
                          0.7 * np.cos(2 * np.pi * t / L)], -1),
        "ramp": np.stack([np.linspace(-0.9, 0.9, L)] * 2, -1),
        "saturating": np.stack([np.linspace(-2.0, 2.0, L)] * 2, -1),
    }
    frames["impulse"][L // 2, 0] = 1.0
    # OFDM-like frames: IFFT of random QPSK symbols + AWGN, joint-normalized
    # the way the training datagen does (utils/dataset.py:284-287 semantics)
    for name, snr_db in [("ofdm_clean", None), ("ofdm_snr20", 20.0),
                         ("ofdm_snr10", 10.0), ("ofdm_snr0", 0.0)]:
        sym = (rng.choice([-1, 1], L) + 1j * rng.choice([-1, 1], L)) / np.sqrt(2)
        x = np.fft.ifft(sym) * np.sqrt(L)
        if snr_db is not None:
            p = np.mean(np.abs(x) ** 2)
            n = np.sqrt(p / 10 ** (snr_db / 10) / 2)
            x = x + n * (rng.standard_normal(L) + 1j * rng.standard_normal(L))
        iq = np.stack([x.real, x.imag], -1)
        frames[name] = iq / max(1e-9, np.abs(iq).max())
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint",
                    default="results/residual_checkpoints/rtl_qat/champion_params_g.npz")
    ap.add_argument("--out_dir", default="rtl/handoff_rtl_residual")
    ap.add_argument("--rom_file", default="rtl/weight_rom_rtl_residual.v")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side integer engine
    import numpy as np

    from ofdmgan_tpu.quant import intsim
    from ofdmgan_tpu.quant.rom_codegen import generate_rom_verilog, pack_rom_arrays
    from ofdmgan_tpu.verify.golden import write_hex

    params = load_npz_params(args.checkpoint)
    ip = intsim.quantize_weights_rtl(params, "generator")

    nw, nb = generate_rom_verilog(params, None, args.rom_file, int_source="q17")
    print(f"{args.rom_file}: {nw} weights, {nb} biases (RTL-residual champion)")

    out = Path(args.out_dir)
    (out / "vectors").mkdir(parents=True, exist_ok=True)

    weights, biases = pack_rom_arrays(params, None, int_source="q17")
    with open(out / "weights.hex", "w") as f:
        for v in weights:
            f.write(f"{int(v) & 0xFF:02X}\n")
    with open(out / "biases.hex", "w") as f:
        for v in biases:
            f.write(f"{int(v) & 0xFFFF:04X}\n")

    frames = make_test_frames()
    manifest = {"checkpoint": args.checkpoint,
                "datapath": "rtl_residual (see docs/rtl_residual_datapath.md)",
                "format": "Q8.8 int16, 4-hex-digit two's complement, one word "
                          "per line; 16 I samples then 16 Q samples",
                "engines_agreeing": ["ofdmgan_tpu/quant/intsim.py:generator_int_forward",
                                     "native/fixsim.cpp:fixsim_generator_forward_res"],
                "vectors": {}}
    for name, frame in frames.items():
        xq = np.asarray(intsim.float_to_q88(frame[None].astype(np.float32)))
        yq = np.asarray(intsim.generator_int_forward(ip, xq, "rtl_residual"))
        # channel-first flatten (I samples then Q) — golden-vector convention
        in_flat = xq[0].T.astype(np.int16)
        out_flat = yq[0].T.astype(np.int16)
        write_hex(out / "vectors" / f"{name}_in.hex", in_flat)
        write_hex(out / "vectors" / f"{name}_out.hex", out_flat)
        manifest["vectors"][name] = {
            "in_crc32": zlib.crc32(in_flat.tobytes()),
            "out_crc32": zlib.crc32(out_flat.tobytes()),
            "out_range_q88": [int(out_flat.min()), int(out_flat.max())],
        }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(f"{out}: {len(frames)} vector pairs + ROM hex images + manifest")


if __name__ == "__main__":
    main()
