#!/usr/bin/env python3
"""Extract generator params from an Orbax training checkpoint into a flat
``champion_params_g.npz`` (keys are '/'-joined pytree paths) plus a JSON
metadata sidecar — the committed-artifact format under results/.

Usage:
  python scripts/extract_champion.py --checkpoint /tmp/run/best_model \
      --out results/full_unet_run [--ema] [--meta '{"best_val_l1": 0.19}']

``--ema`` extracts the EMA generator weights (saved by train.py --ema) in
place of the raw ones.
"""

import argparse
import json
from pathlib import Path

import numpy as np


def flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True, help="Orbax checkpoint dir")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--ema", action="store_true",
                    help="extract the EMA generator (ema_params_g subtree)")
    ap.add_argument("--meta", default=None, help="extra JSON merged into meta")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side tool; never touch TPU
    import orbax.checkpoint as ocp

    ckpt = Path(args.checkpoint).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    if args.ema:
        params = ckptr.restore(str(ckpt / "ema_params_g"))
    else:
        restored = ckptr.restore(str(ckpt))
        params = restored["params_g"] if "params_g" in restored else restored

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    flat = flatten(params)
    np.savez(out / "champion_params_g.npz", **flat)

    meta = {}
    sidecar = ckpt / "trainer_state.json"
    if sidecar.exists():
        s = json.loads(sidecar.read_text())
        meta.update({k: s[k] for k in ("epoch", "global_step", "best_val_loss")
                     if k in s})
    meta["source_checkpoint"] = str(ckpt)
    meta["weights"] = "ema" if args.ema else "raw"
    if args.meta:
        meta.update(json.loads(args.meta))
    (out / "champion_meta.json").write_text(json.dumps(meta, indent=2) + "\n")
    n = sum(int(np.prod(v.shape)) for v in flat.values())
    print(f"wrote {out / 'champion_params_g.npz'} ({len(flat)} arrays, "
          f"{n:,} params) + champion_meta.json")


if __name__ == "__main__":
    main()
