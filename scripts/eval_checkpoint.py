#!/usr/bin/env python3
"""High-sample validation of trained generator checkpoints.

Per-epoch trainer validation uses ~1 batch (noisy to ±0.003 L1), so "best
val" selection inside a run has survivorship bias. This tool re-evaluates
candidate checkpoints on a LARGE fixed-seed validation set (default 100
batches x 512 frames = 51,200 frames) so champions are ranked honestly.

Usage:
  python scripts/eval_checkpoint.py --model full --nonlinear \
      --checkpoint /tmp/run/best_model [--ema] [--batches 100]
Accepts Orbax checkpoint dirs or flat .npz artifacts.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root


def load_params(path: str, ema: bool):
    from ofdmgan_tpu.utils.params_io import load_params_tree

    return load_params_tree(path, ema)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", nargs="+", default=[],
                    help="one or more checkpoint dirs / .npz files")
    ap.add_argument("--identity", action="store_true",
                    help="also report the identity-map baseline (output = "
                         "noisy input) on the same paired batches")
    ap.add_argument("--ema", action="store_true",
                    help="evaluate the EMA generator subtree of each dir")
    ap.add_argument("--model", choices=["mini", "full"], default="mini")
    ap.add_argument("--residual", action="store_true",
                    help="build the mini generator with the input-residual "
                         "head (must match how the checkpoint was trained — "
                         "the param tree is identical between heads, so a "
                         "mismatch silently evaluates the wrong function)")
    ap.add_argument("--int_mode", choices=["rtl", "float_ref", "rtl_residual"],
                    default=None,
                    help="evaluate the Q1.7/Q8.8 INTEGER datapath "
                         "(quant/intsim.py) instead of the float model "
                         "(mini only) — the deployed-hardware function")
    ap.add_argument("--serving", action="store_true",
                    help="full model only: evaluate the SERVING forward "
                         "(models/unet_infer.py — fused upsample+conv "
                         "decoder, bfloat16 params/activations) instead of "
                         "the training forward, validating the deployed "
                         "TPU inference path's accuracy")
    ap.add_argument("--quant_bits", type=int, nargs=2, default=None,
                    metavar=("WEIGHT_BITS", "ACT_BITS"),
                    help="full model only: evaluate the quantization-"
                         "simulated forward (int8 per-channel export "
                         "semantics), e.g. --quant_bits 8 16")
    ap.add_argument("--frame_length", type=int, default=None)
    ap.add_argument("--nonlinear", action="store_true")
    ap.add_argument("--channel", type=str, default="awgn",
                    choices=["awgn", "rayleigh", "rician", "multipath"])
    ap.add_argument("--pa_saturation", type=float, default=0.8)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--batches", type=int, default=100)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.residual and args.int_mode == "rtl":
        ap.error("--residual checkpoints deploy on the 'rtl_residual' integer "
                 "head; pass --int_mode rtl_residual (or float_ref)")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from ofdmgan_tpu.signal.datagen import DatagenConfig

    if args.frame_length is None:
        args.frame_length = 1024 if args.model == "full" else 16
    if args.model == "full":
        from ofdmgan_tpu.models.full_unet import FullUNetGenerator

        qb = dict(zip(("weight_bits", "act_bits"), args.quant_bits)) \
            if args.quant_bits else {}
        gen = FullUNetGenerator(frame_length=args.frame_length, **qb)
    else:
        if args.quant_bits:
            ap.error("--quant_bits applies to the full model (mini uses "
                     "--int_mode for its Q1.7/Q8.8 datapath)")
        from ofdmgan_tpu.models import MiniGenerator

        gen = MiniGenerator(frame_length=args.frame_length,
                            input_residual=args.residual)

    dg = DatagenConfig.make(frame_length=args.frame_length,
                            snr_range=(0, 30), nonlinear=args.nonlinear,
                            channel_type=args.channel,
                            pa_saturation=args.pa_saturation)
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.batches)
    n = args.batches

    def make_sweep(apply_fn):
        # ALL batches inside one jitted lax.scan: a single dispatch per
        # candidate (per-batch dispatch on the remote axon tunnel is ~100x
        # slower than the compute itself)
        from ofdmgan_tpu.signal.datagen import synthetic_batch

        @jax.jit
        def sweep_fn(params):
            def body(_, k):
                batch = synthetic_batch(k, args.batch_size, dg)
                fake = apply_fn(params, batch["noisy"])
                l1 = jnp.mean(jnp.abs(fake - batch["clean"]))
                mse = jnp.mean((fake - batch["clean"]) ** 2)
                return 0, (l1, mse)

            _, (l1s, mses) = jax.lax.scan(body, 0, keys)
            return l1s, mses

        return sweep_fn

    if args.int_mode:
        if args.model != "mini":
            ap.error("--int_mode applies to the mini (deployable) generator")
        from ofdmgan_tpu.quant import intsim

        def int_apply(iparams, noisy):
            xq = intsim.float_to_q88(noisy)
            yq = intsim.generator_int_forward(iparams, xq, args.int_mode)
            return intsim.q88_to_float(yq)

        eval_sweep = make_sweep(int_apply)
    elif args.serving:
        if args.model != "full" or args.quant_bits:
            ap.error("--serving is the full model's float serving path "
                     "(mini serving uses the flat apply; quantized eval "
                     "uses --quant_bits)")
        from ofdmgan_tpu.models.unet_infer import make_unet_infer_apply

        serving_apply = make_unet_infer_apply()

        def serve_apply(params, noisy):
            p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
            return serving_apply(p16, noisy).astype(jnp.float32)

        eval_sweep = make_sweep(serve_apply)
    else:
        eval_sweep = make_sweep(gen.apply)

    def sweep(name, sweep_fn, params, weights):
        l1s, mses = map(np.asarray, jax.device_get(sweep_fn(params)))
        r = {
            "val_l1": float(np.mean(l1s)),
            "val_l1_sem": float(np.std(l1s) / np.sqrt(n)),
            "val_mse": float(np.mean(mses)),
            "frames": n * args.batch_size,
            "weights": weights,
        }
        print(f"{name}: val L1 {r['val_l1']:.5f} ± {r['val_l1_sem']:.5f} "
              f"MSE {r['val_mse']:.5f}  ({r['frames']} frames, {weights})",
              flush=True)
        return r

    results = {}
    if args.identity:
        results["identity"] = sweep(
            "identity", make_sweep(lambda params, noisy: noisy), {}, "—")
    for ck in args.checkpoint:
        params = load_params(ck, args.ema)
        if args.int_mode:
            from ofdmgan_tpu.quant import intsim as _intsim

            params = _intsim.quantize_weights_rtl(params, "generator")
        results[ck] = sweep(ck, eval_sweep, params,
                            f"int:{args.int_mode}" if args.int_mode
                            else ("ema" if args.ema else "raw"))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
