#!/usr/bin/env python3
"""Standalone weight-export CLI (reference export.py:29-76 equivalent).

Loads a trainer checkpoint (Orbax directory) and writes the FPGA-format
export bundle (int8 weights, float32 scales/biases, metadata.json, CRC32).
"""

import argparse
from pathlib import Path


def main():
    parser = argparse.ArgumentParser(description="Export trained generator weights")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Orbax checkpoint directory (e.g. checkpoints/best_model)")
    parser.add_argument("--export_dir", type=str, default="./export")
    parser.add_argument("--discriminator", action="store_true",
                        help="Also export the critic (not possible in the reference)")
    parser.add_argument("--bias_format", choices=["float32", "int32_q1616"],
                        default="float32")
    args = parser.parse_args()

    # Host-side tool (CLAUDE.md convention): force CPU BEFORE orbax touches
    # jax.default_backend(), which would otherwise initialize the remote
    # axon client — slow, and a hard hang if the tunnel relay is down (the
    # register shim dials it even under JAX_PLATFORMS=cpu).
    import jax

    jax.config.update("jax_platforms", "cpu")

    import orbax.checkpoint as ocp
    from ofdmgan_tpu.quant.export import export_discriminator, export_generator

    restored = ocp.PyTreeCheckpointer().restore(str(Path(args.checkpoint).absolute()))
    params_g = restored["params_g"] if "params_g" in restored else restored
    out = Path(args.export_dir)
    meta = export_generator(params_g, str(out / "generator"),
                            write_bias_format=args.bias_format)
    print(f"Exported {len(meta['layers'])} generator layers to {out/'generator'}")
    if args.discriminator and "params_d" in restored:
        meta_d = export_discriminator(restored["params_d"], str(out / "discriminator"),
                                      write_bias_format=args.bias_format)
        print(f"Exported {len(meta_d['layers'])} discriminator layers to {out/'discriminator'}")


if __name__ == "__main__":
    main()
