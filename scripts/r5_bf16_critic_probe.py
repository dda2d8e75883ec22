#!/usr/bin/env python3
"""Stability probe: full-scale WGAN-GP with bf16 activation storage on BOTH
nets (the 32.9k frames/s grid row, results/full_train_speed_r5_critic.json).

The row is labeled roofline-only because WGAN-GP stability at bf16 is not
established at full scale (the mini collapses at bf16 dots unless the
bf16-storage-lattice discipline is applied; RESULTS §Mixed precision). This
probe runs the reference GAN recipe (n_critic 5, adv 1, rec 100) for
PROBE_EPOCHS epochs at batch 512 through the fused-decoder generator and
the bf16-act critic (models/unet_infer.py), logging W distance and rec L1
per epoch and a final paired eval vs the identity baseline. Bounded W + a
sane L1 trajectory upgrades the row to "probed-stable (short horizon)";
divergence/collapse confirms the roofline-only label. Either way the
answer is recorded.

Usage (on chip, ~6 min at 60 epochs):
    python scripts/r5_bf16_critic_probe.py --out results/bf16_critic_probe.json
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--spe", type=int, default=51200)
    ap.add_argument("--frame_length", type=int, default=1024)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="results/bf16_critic_probe.json")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from ofdmgan_tpu.models.full_unet import (FullDiscriminator,
                                              FullUNetGenerator)
    from ofdmgan_tpu.models.unet_infer import (make_full_critic_apply,
                                               make_unet_infer_apply)
    from ofdmgan_tpu.signal import DatagenConfig
    from ofdmgan_tpu.signal.datagen import synthetic_batch
    from ofdmgan_tpu.training import (LossConfig, TrainState, make_adam,
                                      make_train_step)

    fl = args.frame_length
    gen = FullUNetGenerator(frame_length=fl)
    critic = FullDiscriminator(frame_length=fl)
    key = jax.random.PRNGKey(0)
    x0 = np.zeros((1, fl, 2), np.float32)
    params_g = gen.init(key, x0)
    params_d = critic.init(key, x0, x0)
    # champion task: nonlinear AWGN (the full-family reference recipe task)
    dg = DatagenConfig.make(frame_length=fl, snr_range=(0, 30),
                            nonlinear=True, pa_saturation=0.8)
    tx_g, tx_d = make_adam(2e-4), make_adam(2e-4)
    state = TrainState.create(params_g, params_d, tx_g, tx_d)

    gapply = make_unet_infer_apply(levels=gen.levels,
                                   act_dtype=jnp.bfloat16,
                                   fused_decoder=True)
    capply = make_full_critic_apply(levels=critic.levels,
                                    act_dtype=jnp.bfloat16)
    steps_per_epoch = args.spe // args.batch
    step = make_train_step(gapply, capply, tx_g, tx_d, dg,
                           LossConfig(),  # n_critic 5, adv 1, rec 100
                           batch_size=args.batch,
                           scan_steps=steps_per_epoch,
                           matmul_precision="bfloat16")

    # jit the eval datagen: eager ops on the axon backend fail UNIMPLEMENTED
    eval_batch = jax.device_get(jax.jit(
        lambda k: synthetic_batch(k, 2048, dg))(jax.random.PRNGKey(99)))
    fwd = jax.jit(lambda p, x: gen.apply(p, x))  # eval on the f32 module

    hist = []
    t0 = time.time()
    for epoch in range(args.epochs):
        state, m = step(state, jax.random.fold_in(jax.random.PRNGKey(7),
                                                  epoch))
        w = float(jax.device_get(m["wasserstein_distance"])) \
            if "wasserstein_distance" in m else float(jax.device_get(m["d_loss"]))
        rec = float(jax.device_get(m["rec_loss"])) \
            if "rec_loss" in m else float("nan")
        gl = float(jax.device_get(m["g_loss"]))
        hist.append({"epoch": epoch, "w": w, "g_loss": gl, "rec": rec})
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch}: W {w:.4f} G {gl:.3f} rec {rec:.4f}",
                  flush=True)
        if not np.isfinite(w) or abs(w) > 1e4:
            print("DIVERGED", flush=True)
            break

    fake = np.asarray(fwd(state.params_g, jnp.asarray(eval_batch["noisy"])))
    clean = np.asarray(eval_batch["clean"])
    l1 = float(np.mean(np.abs(fake - clean)))
    ident = float(np.mean(np.abs(np.asarray(eval_batch["noisy"]) - clean)))
    amp_ratio = float(np.abs(fake).std() / max(1e-12, np.abs(clean).std()))
    mins = (time.time() - t0) / 60
    verdict = {
        "task": "awgn_nonlinear_full",
        "recipe": "n_critic 5, adv 1, rec 100, bf16 act both nets, "
                  "fused decoder, mm=bfloat16",
        "epochs_run": len(hist),
        "minutes": round(mins, 1),
        "final_w": hist[-1]["w"],
        "w_min_max": [min(h["w"] for h in hist), max(h["w"] for h in hist)],
        "eval_l1_2048": l1,
        "identity_l1_2048": ident,
        "amp_std_ratio": amp_ratio,
        "history": hist,
    }
    Path(args.out).write_text(json.dumps(verdict, indent=1))
    print(json.dumps({k: v for k, v in verdict.items() if k != "history"},
                     indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
