#!/usr/bin/env python3
"""GAN-vs-classical-equalizer benchmark CLI — flag-compatible with the
reference's benchmark_comparison.py:356-378.

Runs two sweeps (linear AWGN and nonlinear impairments), prints MSE tables,
the degradation summary, and saves comparison plots.
"""

import argparse
import os
from pathlib import Path


def main():
    parser = argparse.ArgumentParser(description="Benchmark GAN vs Classical Equalizers")
    parser.add_argument("--checkpoint", type=str, default="checkpoints/best_model",
                        help="Orbax checkpoint directory of a trained GAN")
    parser.add_argument("--n_trials", type=int, default=100)
    parser.add_argument("--model", choices=["mini", "full"], default="mini",
                        help="generator family: mini (258-param, 16-sample) or "
                             "full (3.94M-param 1024-sample U-Net)")
    parser.add_argument("--frame_length", type=int, default=None,
                        help="frame length (default 16 for mini, 1024 for full)")
    parser.add_argument("--snr_min", type=float, default=0)
    parser.add_argument("--snr_max", type=float, default=30)
    parser.add_argument("--snr_step", type=float, default=5)
    parser.add_argument("--channel", type=str, default="awgn",
                        choices=["awgn", "rayleigh", "rician", "multipath"])
    parser.add_argument("--nonlinear", action="store_true",
                        help="run ONLY the nonlinear sweep (default: both)")
    parser.add_argument("--pa_saturation", type=float, default=0.8)
    parser.add_argument("--qat", action="store_true",
                        help="the checkpoint was trained with --qat: evaluate the "
                             "float rows with the QAT forward (STE quantization ops)")
    parser.add_argument("--rtl_qat", action="store_true",
                        help="the checkpoint was trained with --rtl_qat")
    parser.add_argument("--residual", action="store_true",
                        help="mini generator with the input-residual head "
                             "(must match the checkpoint's training head — "
                             "the param tree is head-agnostic)")
    parser.add_argument("--quantized", action="store_true",
                        help="add a GAN-Q row: the Q1.7/Q8.8 fixed-point generator")
    parser.add_argument("--int_mode", choices=["rtl", "float_ref", "rtl_residual"], default=None,
                        help="fixed-point semantics for GAN-Q: 'rtl' reproduces the "
                             "hardware's aggressive approximations; 'float_ref' is "
                             "this framework's faithful-rounding integer design; "
                             "'rtl_residual' the saturating input-adder head "
                             "(default: rtl, or rtl_residual when --residual is set)")
    parser.add_argument("--normalization", choices=["independent", "joint"],
                        default="independent",
                        help="independent = the reference's protocol; joint = "
                             "the training protocol (shared noisy/clean scale)")
    parser.add_argument("--protocol", choices=["oracle", "pilot"], default="oracle",
                        help="oracle = the reference's quirk (equalizers see the "
                             "clean data frame, benchmark_comparison.py:219-245); "
                             "pilot = fair known-preamble channel estimation / "
                             "tap adaptation only")
    parser.add_argument("--output_dir", type=str, default="./benchmark_results")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()

    # A residual-trained checkpoint must be deployed on the residual integer
    # head; the param tree is head-agnostic, so a mismatched int_mode would
    # silently evaluate the wrong function (advisor finding, round 2).
    if args.int_mode is None:
        args.int_mode = "rtl_residual" if args.residual else "rtl"
    elif args.residual and args.int_mode == "rtl":
        parser.error("--residual checkpoints deploy on the 'rtl_residual' integer "
                     "head; pass --int_mode rtl_residual (or float_ref) explicitly")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from ofdmgan_tpu.eval.benchmark import (
        degradation_summary, plot_benchmark_results, print_results_table, run_benchmark,
    )
    from ofdmgan_tpu.models import MiniGenerator, count_parameters

    print(f"Using devices: {jax.devices()}")
    snr_values = [float(s) for s in np.arange(args.snr_min, args.snr_max + 1, args.snr_step)]
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    if args.frame_length is None:
        args.frame_length = 1024 if args.model == "full" else 16
    gen_q_apply = None
    if args.model == "full":
        if args.qat or args.rtl_qat:
            parser.error("--qat/--rtl_qat apply to the mini (RTL-deployable) "
                         "generator only")
        from ofdmgan_tpu.models.full_unet import FullUNetGenerator

        gen = FullUNetGenerator(frame_length=args.frame_length)
        if args.quantized:
            # GAN-Q row = the int8 per-channel / int16-activation export
            # semantics simulated in the forward (models/full_unet.py);
            # same param tree, so the float checkpoint evaluates directly
            gen_q_apply = FullUNetGenerator(
                frame_length=args.frame_length, weight_bits=8, act_bits=16,
            ).apply
    else:
        gen = MiniGenerator(frame_length=args.frame_length,
                            qat=args.qat or args.rtl_qat,
                            rtl_faithful=args.rtl_qat,
                            input_residual=args.residual)
    if os.path.exists(args.checkpoint) and args.checkpoint.endswith(".npz"):
        # flat champion artifact written by scripts/extract_champion.py
        print(f"Loading npz weights: {args.checkpoint}")
        flat = np.load(args.checkpoint)
        params_g = {}
        for path, arr in flat.items():
            node, keys = params_g, path.split("/")
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            node[keys[-1]] = arr
    elif os.path.exists(args.checkpoint):
        import orbax.checkpoint as ocp

        print(f"Loading checkpoint: {args.checkpoint}")
        restored = ocp.PyTreeCheckpointer().restore(str(Path(args.checkpoint).absolute()))
        params_g = restored["params_g"] if "params_g" in restored else restored
    else:
        print("Warning: No checkpoint found, using untrained generator")
        print("Results will show potential, not actual trained performance")
        import jax.numpy as jnp

        params_g = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, args.frame_length, 2)))
    inner = params_g.get("params", params_g) if isinstance(params_g, dict) else {}
    expected = "enc1_1" if args.model == "full" else "enc1"
    if inner and expected not in inner:
        parser.error(f"checkpoint does not hold a '{args.model}' generator "
                     f"(missing layer '{expected}'; found {sorted(inner)[:4]}...) "
                     f"— pass the matching --model")
    print(f"Generator parameters: {count_parameters(params_g):,}")

    kw = dict(n_trials=args.n_trials, frame_length=args.frame_length,
              snr_values=snr_values, seed=args.seed,
              normalization=args.normalization, include_quantized=args.quantized,
              int_mode=args.int_mode, protocol=args.protocol,
              gen_q_apply=gen_q_apply)

    results_nl = None
    if not args.nonlinear:
        print("\n" + "=" * 80 + "\n  BENCHMARK 1: Linear Channel (AWGN)\n" + "=" * 80)
        results_lin = run_benchmark(gen.apply, params_g, channel_type=args.channel,
                                    nonlinear=False, **kw)
        print_results_table(results_lin, snr_values, "Linear AWGN Channel - MSE (dB)")
        plot_benchmark_results(results_lin, snr_values, "(Linear AWGN)",
                               out / "benchmark_linear_awgn.png")
    else:
        results_lin = None

    print("\n" + "=" * 80 +
          "\n  BENCHMARK 2: Non-Linear Impairments (PA + IQ + Phase Noise)\n" + "=" * 80)
    results_nl = run_benchmark(gen.apply, params_g, channel_type=args.channel,
                               nonlinear=True, pa_saturation=args.pa_saturation, **kw)
    print_results_table(results_nl, snr_values,
                        f"Non-Linear Impairments (PA sat={args.pa_saturation}) - MSE (dB)")
    plot_benchmark_results(results_nl, snr_values,
                           f"(Non-Linear, PA={args.pa_saturation})",
                           out / "benchmark_nonlinear.png")

    if results_lin is not None:
        print("\n" + "=" * 80 + "\n  COMPARISON SUMMARY\n" + "=" * 80)
        degradation_summary(results_lin, results_nl, snr_values)
        print("\nKey Insight: Classical methods degrade significantly with non-linear")
        print("impairments. GAN shows more robust performance.")
    print(f"\nResults saved to: {out}")


if __name__ == "__main__":
    main()
