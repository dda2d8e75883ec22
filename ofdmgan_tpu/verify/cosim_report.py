"""Integer-datapath verification suite + dashboard.

Behavioral parity target: reference visualization/rtl_verification_viz.py
(62-652): compile-and-run the hardware testbenches, parse PASS/FAIL and
per-scenario MSE/SNR/EVM, write ``rtl_verification_results.json`` and a
summary dashboard. Here the "hardware" is the framework's own bit-true
integer datapath, exercised two ways (JAX intsim and the native C++
engine) and cross-checked bit-for-bit — a stronger check than parsing
simulator stdout, producing ``cosim_verification_results.json``.

Test sets mirror the reference testbenches:
  * generator: zero / DC / impulse / sine / ramp patterns
    (tb_generator_mini.v:214-430) + 5 OFDM channel scenarios
    (tb_cwgan_gp_full.v:447-586),
  * discriminator: zero / matching / mismatched / random / DC
    (tb_discriminator_mini.v:179-255),
  * system: generator -> critic(fake, cond) + critic(clean, cond)
    "training mode" pass (tb_cwgan_gp.v:328-503).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict

import numpy as np

QPSK_EVM_LIMIT_PERCENT = 17.5  # acceptance criterion (tb_generator_mini.v:719-720)


def _q88(x: np.ndarray) -> np.ndarray:
    return np.clip(np.trunc(x * 256.0), -32768, 32767).astype(np.int16)


def _gen_patterns(frame: int = 16) -> Dict[str, np.ndarray]:
    t = np.arange(frame)
    rng = np.random.default_rng(7)
    return {
        "zero": np.zeros((frame, 2), np.float32),
        "dc": np.full((frame, 2), 0.5, np.float32),
        "impulse": (np.eye(frame, 2, dtype=np.float32) * 0.9),
        "sine": np.stack([np.sin(2 * np.pi * t / frame),
                          np.cos(2 * np.pi * t / frame)], -1).astype(np.float32) * 0.7,
        "ramp": np.stack([t / frame, 1 - t / frame], -1).astype(np.float32),
        "random": rng.standard_normal((frame, 2)).astype(np.float32) * 0.4,
    }


def _ofdm_scenarios(frame: int = 16) -> Dict[str, Dict[str, np.ndarray]]:
    from ..viz.signal_viz import OFDMSignalGenerator

    g = OFDMSignalGenerator(frame_length=frame, seed=3)
    clean = g.clean_frame()
    ref = np.stack([clean.i, clean.q], -1).astype(np.float32)
    scen = {
        "awgn_30pct": g.add_awgn(clean, 30.0),
        "deep_fade_60pct": g.add_deep_fade(g.add_awgn(clean, 10.0), 60.0),
        "burst_interference": g.add_burst_interference(g.add_awgn(clean, 10.0)),
        "freq_selective": g.add_frequency_selective_fade(g.add_awgn(clean, 10.0)),
        "worst_case": g.add_deep_fade(g.add_awgn(clean, 50.0), 80.0),
    }
    return {
        k: {"degraded": np.stack([s.i, s.q], -1).astype(np.float32), "clean": ref}
        for k, s in scen.items()
    }


def run_cosim_verification(
    gen_params=None,
    disc_params=None,
    output_dir: str = "./verification_output",
    use_native: bool = True,
) -> Dict[str, Any]:
    """Run the full integer-datapath verification suite."""
    import jax
    import jax.numpy as jnp

    from ..models import MiniDiscriminator, MiniGenerator
    from ..quant import intsim
    from ..quant.rom_codegen import pack_rom_arrays
    from . import cosim

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)

    key = jax.random.PRNGKey(0)
    x0 = np.zeros((1, 16, 2), np.float32)
    gen, disc = MiniGenerator(), MiniDiscriminator()
    if gen_params is None:
        gen_params = gen.init(key, x0)
    if disc_params is None:
        disc_params = disc.init(key, x0, x0)
    gen_params = jax.device_get(gen_params)
    disc_params = jax.device_get(disc_params)
    ip_g = intsim.quantize_weights_rtl(gen_params, "generator")
    ip_d = intsim.quantize_weights_rtl(disc_params, "discriminator")
    rom_w, rom_b = pack_rom_arrays(gen_params, disc_params)
    native_ok = use_native and cosim.available()

    results: Dict[str, Any] = {"tests": [], "passed_tests": 0, "total_tests": 0}

    def record(name: str, passed: bool, details: Dict[str, Any]):
        results["tests"].append({"name": name, "passed": bool(passed), **details})
        results["total_tests"] += 1
        results["passed_tests"] += int(passed)

    # ---- generator pattern tests
    for pname, pat in _gen_patterns().items():
        q = intsim.float_to_q88(jnp.asarray(pat[None]))
        y = np.asarray(intsim.generator_int_forward(ip_g, q, "rtl"))
        ok = bool(np.all(np.abs(y) <= 256)) and bool(np.all(np.isfinite(y)))
        det = {"kind": "generator_pattern", "out_min": int(y.min()), "out_max": int(y.max())}
        if native_ok:
            yn = cosim.generator_forward(rom_w, rom_b, np.swapaxes(np.asarray(q, np.int16), 1, 2))
            det["native_bitexact"] = bool(
                np.array_equal(np.swapaxes(y, 1, 2).astype(np.int16), yn)
            )
            ok = ok and det["native_bitexact"]
        record(f"gen_{pname}", ok, det)

    # ---- generator OFDM scenarios (with float-model and int-path metrics)
    for sname, d in _ofdm_scenarios().items():
        deg, ref = d["degraded"][None], d["clean"][None]
        q = intsim.float_to_q88(jnp.asarray(deg))
        y = np.asarray(intsim.generator_int_forward(ip_g, q, "rtl"))
        enh = y.astype(np.float32) / 256.0
        mse_before = float(np.mean((deg - ref) ** 2))
        mse_after = float(np.mean((enh - ref) ** 2))
        evm_pct = float(100 * np.sqrt(np.mean((enh - ref) ** 2) / (np.mean(ref**2) + 1e-12)))
        det = {
            "kind": "generator_ofdm",
            "mse_degraded": mse_before,
            "mse_enhanced": mse_after,
            "snr_before_db": float(10 * np.log10(np.mean(ref**2) / (mse_before + 1e-12))),
            "snr_after_db": float(10 * np.log10(np.mean(ref**2) / (mse_after + 1e-12))),
            "evm_percent": evm_pct,
            "evm_limit_percent": QPSK_EVM_LIMIT_PERCENT,
        }
        ok = np.isfinite(mse_after)
        if native_ok:
            yn = cosim.generator_forward(rom_w, rom_b, np.swapaxes(np.asarray(q, np.int16), 1, 2))
            det["native_bitexact"] = bool(np.array_equal(np.swapaxes(y, 1, 2).astype(np.int16), yn))
            ok = ok and det["native_bitexact"]
        record(f"gen_ofdm_{sname}", ok, det)

    # ---- discriminator tests
    rng = np.random.default_rng(11)
    rnd = rng.standard_normal((16, 2)).astype(np.float32) * 0.4
    disc_cases = {
        "zero": (np.zeros((16, 2), np.float32), np.zeros((16, 2), np.float32)),
        "matching": (rnd, rnd),
        "mismatched": (rnd, -rnd),
        "random": (rng.standard_normal((16, 2)).astype(np.float32) * 0.4, rnd),
        "dc": (np.full((16, 2), 0.4, np.float32), np.full((16, 2), 0.4, np.float32)),
    }
    for dname, (cand, cond) in disc_cases.items():
        qc = intsim.float_to_q88(jnp.asarray(cand[None]))
        qd = intsim.float_to_q88(jnp.asarray(cond[None]))
        s = np.asarray(intsim.discriminator_int_forward(ip_d, qc, qd, "rtl"))
        ok = bool(np.isfinite(s).all()) and abs(int(s[0, 0])) <= 32767
        det = {"kind": "discriminator", "score_q88": int(s[0, 0]),
               "score_float": float(s[0, 0]) / 256.0}
        if native_ok:
            sn = cosim.discriminator_forward(
                rom_w, rom_b,
                np.swapaxes(np.asarray(qc, np.int16), 1, 2),
                np.swapaxes(np.asarray(qd, np.int16), 1, 2),
            )
            det["native_bitexact"] = bool(int(sn[0]) == int(s[0, 0]))
            ok = ok and det["native_bitexact"]
        record(f"disc_{dname}", ok, det)

    # ---- system "training mode" pass: G -> D(fake,cond), D(clean,cond)
    scen = _ofdm_scenarios()["awgn_30pct"]
    cond_q = intsim.float_to_q88(jnp.asarray(scen["degraded"][None]))
    clean_q = intsim.float_to_q88(jnp.asarray(scen["clean"][None]))
    fake_q = intsim.generator_int_forward(ip_g, cond_q, "rtl")
    s_fake = int(np.asarray(intsim.discriminator_int_forward(ip_d, fake_q, cond_q, "rtl"))[0, 0])
    s_real = int(np.asarray(intsim.discriminator_int_forward(ip_d, clean_q, cond_q, "rtl"))[0, 0])
    record("system_training_mode", True,
           {"kind": "system", "score_fake_q88": s_fake, "score_real_q88": s_real})

    results["native_engine"] = native_ok
    with open(out / "cosim_verification_results.json", "w") as f:
        json.dump(results, f, indent=2)
    _render_dashboard(results, out / "cosim_dashboard.png")
    return results


def _render_dashboard(results: Dict[str, Any], path: Path):
    """Status-grid dashboard (rtl_verification_viz.py:291-601 role)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tests = results["tests"]
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(13, max(4, 0.4 * len(tests))))
    names = [t["name"] for t in tests]
    colors = ["#2e9e4f" if t["passed"] else "#cc3333" for t in tests]
    y = np.arange(len(tests))
    ax1.barh(y, [1] * len(tests), color=colors)
    ax1.set_yticks(y, names, fontsize=7)
    ax1.set_xticks([])
    ax1.invert_yaxis()
    ax1.set_title(f"Cosim verification: {results['passed_tests']}/{results['total_tests']} passed")

    ofdm = [t for t in tests if t.get("kind") == "generator_ofdm"]
    if ofdm:
        labels = [t["name"].replace("gen_ofdm_", "") for t in ofdm]
        x = np.arange(len(ofdm))
        ax2.bar(x - 0.2, [t["snr_before_db"] for t in ofdm], 0.4, label="degraded SNR")
        ax2.bar(x + 0.2, [t["snr_after_db"] for t in ofdm], 0.4, label="after int datapath")
        ax2.set_xticks(x, labels, rotation=20, fontsize=7)
        ax2.set_ylabel("SNR (dB)")
        ax2.legend(fontsize=8)
        ax2.grid(alpha=0.3, axis="y")
        ax2.set_title("OFDM scenarios")
    fig.tight_layout()
    fig.savefig(path, dpi=130)
    plt.close(fig)
