#!/usr/bin/env python3
"""Cross-channel generalization matrix for the mini residual champions.

Every committed residual-head champion (AWGN + the four fading families,
results/RESULTS.md §Fading-channel models) is evaluated on EVERY channel
family's paired 51,200-frame validation distribution — answering the
transfer question the per-task tables leave open: how brittle is each
trained equalizer off its training channel, and is there a single
checkpoint that degrades gracefully everywhere? The identity baseline per
channel anchors each column (a model above identity on a channel is
actively harmful there).

Linear matrix: train ∈ {awgn, rayleigh, rician, multipath} × eval channel
∈ the same four. Nonlinear 2×2: {awgn+PA, multipath+PA} models on both
nonlinear tasks. Same protocol as scripts/eval_checkpoint.py (fixed seed
1234, 100×512 paired frames, one jitted lax.scan per sweep).

Output: results/fading/cross_channel_matrix.json + a printed table.
"""

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

LINEAR_MODELS = {
    "awgn": "results/residual_checkpoints/linear/champion_params_g.npz",
    "rayleigh": "results/fading/rayleigh_checkpoint",
    "rician": "results/fading/rician_checkpoint",
    "multipath": "results/fading/multipath_linear_checkpoint",
}
NONLINEAR_MODELS = {
    "awgn": "results/residual_checkpoints/nonlinear/champion_params_g.npz",
    "multipath": "results/fading/multipath_nonlinear_checkpoint",
}
CHANNELS = ["awgn", "rayleigh", "rician", "multipath"]


def load_params(path: str):
    from ofdmgan_tpu.utils.params_io import load_params_tree

    return load_params_tree(str(REPO / path))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--batches", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from ofdmgan_tpu.models import MiniGenerator
    from ofdmgan_tpu.signal.datagen import DatagenConfig, synthetic_batch

    gen = MiniGenerator(input_residual=True)  # all champions are residual-head
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.batches)

    def sweep(apply_fn, params, dg):
        @jax.jit
        def sweep_fn(params):
            def body(_, k):
                batch = synthetic_batch(k, args.batch_size, dg)
                fake = apply_fn(params, batch["noisy"])
                return 0, jnp.mean(jnp.abs(fake - batch["clean"]))

            _, l1s = jax.lax.scan(body, 0, keys)
            return l1s

        l1s = np.asarray(jax.device_get(sweep_fn(params)))
        return float(np.mean(l1s)), float(np.std(l1s) / np.sqrt(args.batches))

    results = {}
    for nonlinear, model_set, tag in (
        (False, LINEAR_MODELS, "linear"),
        (True, NONLINEAR_MODELS, "nonlinear"),
    ):
        eval_channels = CHANNELS if not nonlinear else list(NONLINEAR_MODELS)
        grid = {}
        for ch in eval_channels:
            dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30),
                                    channel_type=ch, nonlinear=nonlinear,
                                    pa_saturation=0.8)
            col = {}
            col["identity"] = sweep(lambda p, x: x, {}, dg)
            for trained_on, ck in model_set.items():
                col[f"trained_{trained_on}"] = sweep(
                    gen.apply, load_params(ck), dg)
            grid[ch] = col
            print(f"[{tag}] eval channel {ch}: " + "  ".join(
                f"{k}={v[0]:.4f}" for k, v in col.items()), flush=True)
        results[tag] = grid

    out = REPO / "results/fading/cross_channel_matrix.json"
    out.write_text(json.dumps(
        {"protocol": f"{args.batches}x{args.batch_size} paired frames, "
                     f"seed {args.seed}, L=16, SNR 0-30",
         "value": "val L1 (mean, sem)", **results}, indent=1))
    print(f"wrote {out}")

    # human-readable table
    for tag, grid in results.items():
        rows = sorted({r for col in grid.values() for r in col})
        rows = ["identity"] + [r for r in rows if r != "identity"]
        print(f"\n{tag}: rows=model, cols=eval channel (val L1)")
        cols = list(grid)
        print("model".ljust(22) + "".join(c.rjust(11) for c in cols))
        for r in rows:
            print(r.ljust(22) + "".join(
                f"{grid[c][r][0]:.4f}".rjust(11) for c in cols))


if __name__ == "__main__":
    main()
