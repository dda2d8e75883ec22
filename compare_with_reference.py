#!/usr/bin/env python3
"""Trained-model parity evaluation: our CWGAN-GP vs the reference's.

Loads BOTH trained generators — ours (Orbax checkpoint) and the reference's
(torch .pt, ported through utils/torch_port with exact forward parity) —
and runs them through identical evaluation harnesses:

  * validation L1/MSE on the synthetic training distribution,
  * the GAN-vs-classical benchmark rows (MSE/EVM vs SNR),
  * BER curves (time-domain QPSK and QPSK-OFDM protocols) with the SNR
    offset at BER=1e-2 — the "within 0.1 dB" parity figure (BASELINE.md).

Writes ``parity_report.json``.
"""

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default="checkpoints/best_model",
                    help="our Orbax checkpoint dir")
    ap.add_argument("--reference", default="/tmp/refrun/checkpoints/best_model.pt",
                    help="reference torch checkpoint (.pt)")
    ap.add_argument("--n_trials", type=int, default=200)
    ap.add_argument("--output", default="parity_report.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from ofdmgan_tpu.eval.ber import ber_curve_snr_offset, ber_ofdm, ber_time_domain
    from ofdmgan_tpu.eval.benchmark import run_benchmark
    from ofdmgan_tpu.models import MiniGenerator
    from ofdmgan_tpu.signal import DatagenConfig
    from ofdmgan_tpu.training import make_eval_step
    from ofdmgan_tpu.utils.torch_port import (
        generator_params_from_torch, load_torch_state_dict,
    )

    gen = MiniGenerator()
    import orbax.checkpoint as ocp

    ours = ocp.PyTreeCheckpointer().restore(str(Path(args.ours).absolute()))
    params_ours = ours["params_g"] if "params_g" in ours else ours
    params_ref = generator_params_from_torch(load_torch_state_dict(args.reference))

    report = {"ours_checkpoint": args.ours, "reference_checkpoint": args.reference}

    # --- validation metrics on the shared synthetic distribution
    dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
    ev = make_eval_step(gen.apply, dg, 8192)
    key = jax.random.PRNGKey(123)
    m_ours = {k: float(v) for k, v in ev(params_ours, key).items()}
    m_ref = {k: float(v) for k, v in ev(params_ref, key).items()}
    report["val"] = {"ours": m_ours, "reference": m_ref}
    print(f"val L1:  ours {m_ours['rec_loss']:.4f} | reference {m_ref['rec_loss']:.4f}")
    print(f"val MSE: ours {m_ours['mse']:.4f} | reference {m_ref['mse']:.4f}")

    # --- benchmark rows
    snrs = [0.0, 5.0, 10.0, 15.0, 20.0, 25.0, 30.0]
    rows = {}
    for name, p in (("ours", params_ours), ("reference", params_ref)):
        res = run_benchmark(gen.apply, p, n_trials=args.n_trials, snr_values=snrs)
        rows[name] = {str(s): res["GAN"][s] for s in snrs}
    report["benchmark_gan_row"] = rows
    print("\nGAN MSE (dB) vs SNR:")
    print("SNR     ours    reference   delta")
    for s in snrs:
        a = 10 * np.log10(rows["ours"][str(s)]["mse"] + 1e-10)
        b = 10 * np.log10(rows["reference"][str(s)]["mse"] + 1e-10)
        print(f"{s:4.0f}  {a:7.2f}  {b:9.2f}  {a-b:+6.2f}")

    # --- BER curves
    ber_snrs = list(np.arange(0.0, 21.0, 2.0))
    report["ber"] = {}
    for proto, fn in (("time_domain_qpsk", ber_time_domain), ("ofdm_qpsk", ber_ofdm)):
        ours_c = fn(gen.apply, params_ours, ber_snrs)
        ref_c = fn(gen.apply, params_ref, ber_snrs)
        base_c = fn(None, None, ber_snrs)
        off = ber_curve_snr_offset(ours_c, ref_c, 1e-2)
        report["ber"][proto] = {
            "ours": ours_c, "reference": ref_c, "no_eq": base_c,
            "snr_offset_ours_vs_ref_db_at_1e-2": off,
        }
        print(f"\nBER ({proto}): SNR offset ours-vs-reference at 1e-2: "
              f"{off if off is None else round(off, 3)} dB")

    Path(args.output).write_text(json.dumps(report, indent=2))
    print(f"\nWrote {args.output}")


if __name__ == "__main__":
    main()
