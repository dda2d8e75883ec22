#!/usr/bin/env python3
"""Full-model export -> mini RTL ROM codegen CLI.

Reference surface: utils/export_mini_weights.py:399-410 (same flags).
Slices the exported full 5-level U-Net down to the mini architecture and
emits weight_rom.v/bias_rom.v with the RTL address map. Falls back to a
freshly-initialized mini model's ROM when the export directory is missing
(the reference falls back to random weights).
"""

import argparse
import os


def main():
    parser = argparse.ArgumentParser(description="Export trained weights to Verilog ROM")
    parser.add_argument("--export_dir", default="export/generator",
                        help="Directory with exported .bin files (full model)")
    parser.add_argument("--output", default="rtl/weight_rom.v",
                        help="Output Verilog file")
    parser.add_argument("--bias_format", choices=["float32", "int32_q1616"],
                        default="float32",
                        help="How to decode the _bias.bin files (the reference "
                             "writes float32 but its own reader assumed int32 Q16.16)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)

    from ofdmgan_tpu.quant.rom_codegen import (
        generate_mini_rom_from_full_export, generate_rom_verilog,
    )

    if os.path.exists(os.path.join(args.export_dir, "enc1_1_weights.bin")):
        print(f"Slicing full-model export at {args.export_dir} ...")
        nw, nb = generate_mini_rom_from_full_export(
            args.export_dir, args.output, args.bias_format
        )
    else:
        print(f"Export not found at {args.export_dir}; using fresh mini weights")
        import jax.numpy as jnp

        from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator

        key = jax.random.PRNGKey(0)
        x0 = jnp.zeros((1, 16, 2))
        pg = MiniGenerator().init(key, x0)
        pd = MiniDiscriminator().init(key, x0, x0)
        nw, nb = generate_rom_verilog(pg, pd, args.output)
    print(f"Generated {args.output}: {nw} weights, {nb} biases")


if __name__ == "__main__":
    main()
