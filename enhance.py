#!/usr/bin/env python3
"""Batch inference CLI: enhance stored I/Q frames with a trained generator.

The deployment-side entry point the reference leaves implicit (its
inference story is the FPGA RTL): load a checkpoint (mini or full U-Net),
read frames from .npy, run the jitted generator in large batches, write
the enhanced frames. Accepts both this framework's channels-last [N, L, 2]
layout and the reference's [N, 2, L] (auto-detected, preserved on output).

``--int_mode rtl|float_ref`` runs the Q1.7/Q8.8 integer datapath instead
(quant/intsim.py; mini model only) — the bit-exact twin of the deployed
hardware, useful for pre-silicon validation of real payloads.
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser(description="Enhance OFDM I/Q frames")
    ap.add_argument("--checkpoint", required=True, help="Orbax checkpoint dir")
    ap.add_argument("--input", required=True, help=".npy of frames [N,L,2] or [N,2,L]")
    ap.add_argument("--output", required=True, help=".npy for enhanced frames")
    ap.add_argument("--model", choices=["mini", "full"], default="mini")
    ap.add_argument("--frame_length", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=8192)
    ap.add_argument("--int_mode", choices=["rtl", "float_ref", "rtl_residual"], default=None,
                    help="run the Q1.7/Q8.8 integer datapath (mini only)")
    ap.add_argument("--residual", action="store_true",
                    help="mini generator with the input-residual head (must "
                         "match the checkpoint's training head; for integer "
                         "inference of residual checkpoints pass "
                         "--int_mode rtl_residual)")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    import jax

    if args.residual and args.int_mode == "rtl":
        raise SystemExit("--residual checkpoints deploy on the 'rtl_residual' "
                         "integer head; pass --int_mode rtl_residual")
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.int_mode:
        # the integer engine is host-side (eager int32 ops)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp
    from pathlib import Path

    x = np.load(args.input).astype(np.float32)
    if x.ndim != 3:
        raise SystemExit(f"expected 3-D frames, got shape {x.shape}")
    ref_layout = x.shape[1] == 2 and x.shape[2] != 2  # reference [N, 2, L]
    if ref_layout:
        x = np.transpose(x, (0, 2, 1))
    n, l = x.shape[0], x.shape[1]
    fl = args.frame_length or l
    if fl != l:
        raise SystemExit(f"frames have length {l}, --frame_length says {fl}")

    restored = ocp.PyTreeCheckpointer().restore(str(Path(args.checkpoint).absolute()))
    params = restored["params_g"] if "params_g" in restored else restored

    if args.int_mode:
        if args.model != "mini":
            raise SystemExit("--int_mode supports the mini (ROM-deployable) model")
        from ofdmgan_tpu.quant import intsim

        ip = intsim.quantize_weights_rtl(jax.device_get(params), "generator")
        out = np.asarray(intsim.q88_to_float(intsim.generator_int_forward(
            ip, intsim.float_to_q88(jnp.asarray(x)), args.int_mode)))
    else:
        if args.model == "full":
            from ofdmgan_tpu.models.full_unet import FullUNetGenerator

            gen = FullUNetGenerator(frame_length=fl)
        else:
            from ofdmgan_tpu.models import MiniGenerator

            gen = MiniGenerator(frame_length=fl, input_residual=args.residual)
        fwd = jax.jit(gen.apply)
        chunks = []
        for i in range(0, n, args.batch_size):
            chunks.append(np.asarray(fwd(params, jnp.asarray(x[i:i + args.batch_size]))))
        out = np.concatenate(chunks, axis=0)

    if ref_layout:
        out = np.transpose(out, (0, 2, 1))
    np.save(args.output, out)
    print(f"Enhanced {n} frames (L={l}, {'int ' + args.int_mode if args.int_mode else 'float'}"
          f"{', reference layout' if ref_layout else ''}) -> {args.output}")


if __name__ == "__main__":
    sys.exit(main())
