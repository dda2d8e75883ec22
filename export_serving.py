#!/usr/bin/env python3
"""AOT serving export: serialize a trained serving forward to StableHLO.

The reference's deployment artifacts are hardware bundles — per-channel
int8 ``.bin`` + ``metadata.json`` for the FPGA flow and ``weight_rom.v``
for its RTL (reference export.py / utils/quantization.py:259-335; both
reproduced byte-exactly by this repo's export.py / export_mini_weights.py).
The TPU-native deployment analog is an *ahead-of-time compiled serving
function*: ``jax.export`` serializes the jitted serving forward — trained
parameters baked in as constants — to a portable, versioned StableHLO
artifact that any JAX/PJRT runtime (or XLA directly) can load and execute
WITHOUT this repo's Python on the import path.

* the batch dimension is SYMBOLIC by default (one artifact serves any
  batch size);
* the artifact is lowered for BOTH ``tpu`` and ``cpu`` PJRT platforms by
  default (same bytes serve on chip and host);
* the full model exports the SERVING forward (models/unet_infer.py:
  fused upsample+conv decoder, bf16 params/activations) — the exact
  function validated accuracy-lossless in results/RESULTS.md §Serving
  forward; the mini exports the flat [B, F] apply (models/flat.py).

Round-trip check (``--selftest``, on by default): deserialize the written
bytes and compare against the in-process forward on random frames.

Usage:
  python export_serving.py --model full \
      --checkpoint results/full_unet_run/champion_params_g.npz \
      --out serving/full_champion
  python export_serving.py --model mini \
      --checkpoint results/residual_checkpoints/nonlinear/champion_params_g.npz \
      --residual --out serving/mini_residual
"""

import argparse
import hashlib
import json
from pathlib import Path


def build_apply(args, params):
    """Return (apply(x)->y, params_baked, input_spec_L) for the family."""
    import jax
    import jax.numpy as jnp

    act = jnp.dtype(args.act_dtype)
    if args.model == "full":
        from ofdmgan_tpu.models.unet_infer import make_unet_infer_apply

        L = 1024
        baked = jax.tree.map(lambda a: jnp.asarray(a, act), params)
        inner = make_unet_infer_apply(act_dtype=act)

        def apply(x):
            with jax.default_matmul_precision("bfloat16"):
                return inner(baked, x.astype(act)).astype(jnp.float32)
    else:
        from ofdmgan_tpu.models.flat import make_generator_flat_apply

        L = args.frame_length
        baked = jax.tree.map(lambda a: jnp.asarray(a), params)
        inner = make_generator_flat_apply(
            frame_length=L, act_dtype=args.act_dtype,
            input_residual=args.residual)

        def apply(x):
            return inner(baked, x).astype(jnp.float32)

    return apply, L


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--model", choices=["mini", "full"], default="mini")
    ap.add_argument("--checkpoint", required=True,
                    help=".npz champion or Orbax checkpoint dir")
    ap.add_argument("--ema", action="store_true",
                    help="export the EMA generator subtree (Orbax dirs)")
    ap.add_argument("--residual", action="store_true",
                    help="mini: the input-residual head (must match how the "
                         "checkpoint was trained)")
    ap.add_argument("--act_dtype", default=None,
                    help="activation/param storage dtype (default: bfloat16 "
                         "for full — the validated serving config; float32 "
                         "for mini)")
    ap.add_argument("--frame_length", type=int, default=16,
                    help="mini frame length (full is fixed at 1024)")
    ap.add_argument("--batch", default="symbolic",
                    help="'symbolic' (any batch size at load time) or a "
                         "fixed integer")
    ap.add_argument("--platforms", default="tpu,cpu",
                    help="comma list of PJRT lowering platforms")
    ap.add_argument("--out", required=True,
                    help="output prefix: writes <out>.stablehlo + "
                         "<out>.metadata.json")
    ap.add_argument("--no_selftest", action="store_true",
                    help="skip the deserialize-and-compare round trip")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform for tracing/selftest (cpu default: "
                         "export is host-side work; lowering targets come "
                         "from --platforms)")
    args = ap.parse_args()
    if args.act_dtype is None:
        args.act_dtype = "bfloat16" if args.model == "full" else "float32"

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from ofdmgan_tpu.utils.params_io import load_params_tree

    params = load_params_tree(args.checkpoint, ema=args.ema)
    apply, L = build_apply(args, params)

    if args.batch == "symbolic":
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(args.batch)
    spec = jax.ShapeDtypeStruct((b, L, 2), jnp.float32)
    platforms = tuple(args.platforms.split(","))
    exported = jexport.export(jax.jit(apply), platforms=platforms)(spec)
    blob = exported.serialize()

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    art = out.with_suffix(".stablehlo")
    art.write_bytes(blob)

    n_params = sum(int(np.prod(np.shape(a))) for a in jax.tree.leaves(params))
    meta = {
        "model": args.model,
        "checkpoint": args.checkpoint,
        "residual": bool(args.residual),
        "ema": bool(args.ema),
        "act_dtype": args.act_dtype,
        "input": f"[{'b' if args.batch == 'symbolic' else b}, {L}, 2] float32 (I/Q channels-last)",
        "output": "same shape, float32",
        "platforms": list(platforms),
        "n_params_baked": n_params,
        "calling_convention": exported.calling_convention_version,
        "jax_version": jax.__version__,
        "artifact_sha256": hashlib.sha256(blob).hexdigest(),
        "artifact_bytes": len(blob),
        "load_with": "jax.export.deserialize(path.read_bytes()).call(x)",
    }
    out.with_suffix(".metadata.json").write_text(json.dumps(meta, indent=2) + "\n")
    print(f"wrote {art} ({len(blob)} bytes) + metadata")

    if not args.no_selftest:
        back = jexport.deserialize(art.read_bytes())
        x = jax.random.normal(jax.random.PRNGKey(0), (4, L, 2), jnp.float32)
        y_art = np.asarray(back.call(x))
        y_ref = np.asarray(apply(x))
        delta = float(np.max(np.abs(y_art - y_ref)))
        # bf16 forwards may fuse differently in the deserialized module than
        # in-process; outputs are tanh-bounded so the meaningful scale is
        # absolute bf16 rounding (~2^-8), vs exactness for f32.
        tol = 1e-5 if jnp.dtype(args.act_dtype) == jnp.float32 else 1e-2
        print(f"selftest: max |deserialize.call - in-process| = {delta:.3e} "
              f"(tol {tol:g} for {args.act_dtype})")
        if not (delta < tol and np.isfinite(y_art).all()):
            raise SystemExit("selftest FAILED")
        print("selftest: PASS")


if __name__ == "__main__":
    main()
