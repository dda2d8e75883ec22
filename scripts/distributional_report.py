#!/usr/bin/env python3
"""Distributional-realism comparison of generator checkpoints.

Answers the adversarial-value question (VERDICT round 2 #5): supervised
training wins paired L1 — does the GAN term win *distribution* matching?
Measures PSD match, amplitude moments, and unbiased MMD² (with a
clean-vs-clean null floor) for each checkpoint, plus the raw-noisy and
identity rows, on the same seeded synthetic task.

Usage:
  python scripts/distributional_report.py --model full --nonlinear \
      --checkpoint supervised=results/full_unet_run/champion_params_g.npz \
                   gan=/tmp/gan_finetune/best_model \
      --json results/distributional_full.json
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from eval_checkpoint import load_params  # noqa: E402  (same scripts/ dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", nargs="+", default=[],
                    help="label=path entries (Orbax dir or flat .npz)")
    ap.add_argument("--model", choices=["mini", "full"], default="mini")
    ap.add_argument("--residual", action="store_true")
    ap.add_argument("--frame_length", type=int, default=None)
    ap.add_argument("--nonlinear", action="store_true")
    ap.add_argument("--channel", type=str, default="awgn",
                    choices=["awgn", "rayleigh", "rician", "multipath"])
    ap.add_argument("--pa_saturation", type=float, default=0.8)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--mmd_samples", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--json", default=None)
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--forward", default="module",
                    choices=["module", "serving", "int8"],
                    help="which deployed forward evaluates the checkpoints "
                         "(full model only): 'module' = the float flax "
                         "forward; 'serving' = the bf16 fused-decoder "
                         "serving forward (models/unet_infer.py — what the "
                         "StableHLO artifact runs); 'int8' = the int8 "
                         "per-channel weight + int16 dynamic activation "
                         "deployment simulation (quant/export semantics). "
                         "Round-5 use: collapse is exactly the failure "
                         "quantization could reintroduce, so champions "
                         "ship with distributional metrics on the deployed "
                         "paths too")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from ofdmgan_tpu.eval.distributional import make_report_fn
    from ofdmgan_tpu.signal.datagen import DatagenConfig

    if args.frame_length is None:
        args.frame_length = 1024 if args.model == "full" else 16
    if args.model == "full":
        from ofdmgan_tpu.models.full_unet import FullUNetGenerator

        gen = FullUNetGenerator(frame_length=args.frame_length)
    else:
        from ofdmgan_tpu.models import MiniGenerator

        gen = MiniGenerator(frame_length=args.frame_length,
                            input_residual=args.residual)

    dg = DatagenConfig.make(frame_length=args.frame_length, snr_range=(0, 30),
                            nonlinear=args.nonlinear,
                            channel_type=args.channel,
                            pa_saturation=args.pa_saturation)
    kw = dict(batch_size=args.batch_size, n_batches=args.batches,
              mmd_samples=args.mmd_samples)
    key = jax.random.PRNGKey(args.seed)

    rows = {}

    def run(label, apply_fn, params):
        r = jax.device_get(make_report_fn(apply_fn, dg, **kw)(params, key))
        me, mc = np.asarray(r["moments_est"]), np.asarray(r["moments_clean"])
        row = {
            "psd_distance_db": float(r["psd_distance_db"]),
            "mmd2": float(r["mmd2"]),
            "mmd2_null_floor": float(r["mmd2_null"]),
            "mmd2_over_null": float(r["mmd2"] / max(1e-12, float(r["mmd2_null"]))),
            "paired_l1": float(r["paired_l1"]),
            "amp_moments_est": [float(v) for v in me],
            "amp_moments_clean": [float(v) for v in mc],
            "amp_std_ratio": float(me[1] / max(1e-12, mc[1])),
        }
        rows[label] = row
        print(f"{label:>24}: PSD Δ {row['psd_distance_db']:7.4f} dB | "
              f"MMD² {row['mmd2']:.3e} (null {row['mmd2_null_floor']:.3e}, "
              f"x{row['mmd2_over_null']:.1f}) | amp-std ratio "
              f"{row['amp_std_ratio']:.4f} | L1 {row['paired_l1']:.5f}", flush=True)

    apply_fn = gen.apply
    if args.forward != "module":
        if args.model != "full":
            ap.error("--forward serving/int8 applies to --model full")
        if args.forward == "serving":
            import jax.numpy as jnp

            from ofdmgan_tpu.models.unet_infer import make_unet_infer_apply

            inner = make_unet_infer_apply(levels=gen.levels,
                                          act_dtype=jnp.bfloat16,
                                          fused_decoder=True)
            apply_fn = lambda p, x: inner(p, x).astype(jnp.float32)
        else:
            qgen = FullUNetGenerator(frame_length=args.frame_length,
                                     weight_bits=8, act_bits=16)
            apply_fn = qgen.apply

    run("noisy (no enhancement)", lambda p, x: x, {})
    for entry in args.checkpoint:
        label, _, path = entry.partition("=")
        if not path:
            label, path = Path(entry).stem, entry
        params = load_params(path, ema=False)
        run(label, apply_fn, params)

    out = {"task": {"model": args.model, "frame_length": args.frame_length,
                    "nonlinear": args.nonlinear, "channel": args.channel,
                    "residual": args.residual, "forward": args.forward,
                    "frames": args.batches * args.batch_size,
                    "mmd_samples": args.mmd_samples, "seed": args.seed},
           "rows": rows}
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))
        print(f"written: {args.json}")


if __name__ == "__main__":
    main()
