"""Full-U-Net TRAINING-throughput study: recipe x matmul precision, on chip.

The mini's headline bench (bench.py) answers "how fast is the fused WGAN-GP
step"; this script answers the question that actually gates full-scale
experimentation: how fast does the 3.94M-param 1024-sample U-Net TRAIN under
(a) the reference GAN recipe (n_critic 5 + gradient penalty) and (b) the
supervised champion recipe (adv_weight 0) — now that n_critic=0 is a true
fast path (training/wgan_gp.py: skips every critic/GP op, bit-exact same
generator trajectory, tests/test_training.py::test_supervised_fast_path_bit_exact)
— at each matmul precision. The full model is MXU compute-bound (channels
32-512 fill the 128x128 tiles; results/RESULTS.md §Perf analysis), so
precision is the dominant lever here, unlike the VPU/issue-bound mini step.

Methodology = bench.py's (hard-synced: each timed window is one jitted
scan-of-steps dispatch ended by a device_get of a metric scalar dependent on
the last step; median of windows after warmup).

Stability note: WGAN-GP requires >= tf32 matmuls (CLAUDE.md); bf16 rows are
measured for the roofline picture, and for the SUPERVISED recipe (no
adversarial equilibrium) bf16 is additionally quality-checked separately.

Usage (on the TPU):
    python scripts/bench_full_train.py --out results/full_train_speed_r3.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--scan_steps", type=int, default=16)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--frame_length", type=int, default=1024)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--out", default="results/full_train_speed_r3.json")
    ap.add_argument("--configs", nargs="*", default=None,
                    help="subset of config names to run (default: all)")
    ap.add_argument("--profile_dir", default=None,
                    help="capture one steady-state window of the LAST grid "
                         "row under the jax profiler (xprof) — feed to "
                         "scripts/xprof_op_table.py for the full-scale "
                         "training op table")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from ofdmgan_tpu.models.full_unet import FullDiscriminator, FullUNetGenerator
    from ofdmgan_tpu.signal import DatagenConfig
    from ofdmgan_tpu.training import LossConfig, TrainState, make_adam, make_train_step

    fl = args.frame_length
    gen = FullUNetGenerator(frame_length=fl)
    critic = FullDiscriminator(frame_length=fl)
    key = jax.random.PRNGKey(0)
    x0 = np.zeros((1, fl, 2), np.float32)
    # keep the canonical init on host: the jitted step donates its state, so
    # each grid config gets fresh device copies
    params_g = jax.device_get(gen.init(key, x0))
    params_d = jax.device_get(critic.init(key, x0, x0))
    # champion task: nonlinear PA/IQ/PN impairments, SNR 0-30 (RESULTS §Full)
    dg = DatagenConfig.make(frame_length=fl, snr_range=(0, 30),
                            nonlinear=True, pa_saturation=0.8)

    # (name, n_critic, adv_weight, matmul_precision, forward)
    # forward: "std" = FullUNetGenerator.apply (materialized NN-upsample +
    # k=3 decoder convs); "fused" = the k=2-pair fused decoder as the
    # TRAINING forward (models/unet_infer.py — exact identity, hence
    # differentiable; train.py --fused_decoder); "fused_bf16" = fused +
    # bf16 activation/operand storage (f32 param cotangents).
    grid = [
        ("gan_f32", 5, 1.0, "float32", "std"),
        ("gan_tf32", 5, 1.0, "tensorfloat32", "std"),
        ("gan_bf16", 5, 1.0, "bfloat16", "std"),   # roofline only: UNSTABLE for WGAN-GP
        ("gan_tf32_fused", 5, 1.0, "tensorfloat32", "fused"),
        ("gan_bf16_fused", 5, 1.0, "bfloat16", "fused"),
        ("gan_bf16_fused_bf16act", 5, 1.0, "bfloat16", "fused_bf16"),
        # + bf16-act CRITIC (make_full_critic_apply): at n_critic 5 the
        # critic dominates the step, so this is where the storage lever
        # actually lives. Roofline row (WGAN-GP stability at bf16 not
        # established at full scale).
        ("gan_bf16_fused_bf16act_critic", 5, 1.0, "bfloat16", "fused_bf16_critic"),
        # the full champion EXACTLY as run (sup_decay_seed2.log: n_critic 1,
        # adv 0 — critic trained but unused by G): the honest "before" row
        ("asrun_champion_f32", 1, 0.0, "float32", "std"),
        ("supervised_f32", 0, 0.0, "float32", "std"),  # the champion recipe, fast path
        ("supervised_tf32", 0, 0.0, "tensorfloat32", "std"),
        ("supervised_bf16", 0, 0.0, "bfloat16", "std"),
        ("supervised_tf32_fused", 0, 0.0, "tensorfloat32", "fused"),
        ("supervised_bf16_fused", 0, 0.0, "bfloat16", "fused"),
        ("supervised_bf16_fused_bf16act", 0, 0.0, "bfloat16", "fused_bf16"),
    ]
    if args.configs:
        grid = [g for g in grid if g[0] in args.configs]

    results = {"batch": args.batch, "scan_steps": args.scan_steps,
               "frame_length": fl, "windows": args.windows, "rows": {}}
    from ofdmgan_tpu.models.unet_infer import (make_full_critic_apply,
                                               make_unet_infer_apply)

    applies = {
        "std": gen.apply,
        "fused": make_unet_infer_apply(levels=gen.levels,
                                       act_dtype=jnp.float32,
                                       fused_decoder=True),
        "fused_bf16": make_unet_infer_apply(levels=gen.levels,
                                            act_dtype=jnp.bfloat16,
                                            fused_decoder=True),
    }
    applies["fused_bf16_critic"] = applies["fused_bf16"]
    for name, n_critic, adv_w, mm, fwd in grid:
        loss = LossConfig(n_critic=n_critic, adv_weight=adv_w)
        tx_g, tx_d = make_adam(2e-4), make_adam(2e-4)
        state = TrainState.create(jax.device_put(params_g),
                                  jax.device_put(params_d), tx_g, tx_d)
        capply = (make_full_critic_apply(levels=critic.levels,
                                         act_dtype=jnp.bfloat16)
                  if fwd.endswith("_critic") else critic.apply)
        step = make_train_step(applies[fwd], capply, tx_g, tx_d, dg,
                               loss, batch_size=args.batch,
                               scan_steps=args.scan_steps,
                               matmul_precision=mm)

        def timed(state, seed):
            t0 = time.perf_counter()
            state, metrics = step(state, jax.random.PRNGKey(seed))
            _ = float(jax.device_get(metrics["rec_loss"]))  # hard sync
            dt = time.perf_counter() - t0
            return state, args.batch * args.scan_steps / dt

        for w in range(2):  # compile + warmup
            state, _ = timed(state, 1000 + w)
        samples = []
        for w in range(args.windows):
            state, fps = timed(state, 2000 + w)
            samples.append(fps)
        samples.sort()
        fps = samples[len(samples) // 2]
        results["rows"][name] = {
            "frames_per_sec": round(fps, 1),
            "ms_per_step": round(1e3 * args.batch / fps, 2),
            "n_critic": n_critic, "adv_weight": adv_w,
            "matmul_precision": mm, "forward": fwd,
            "windows_fps": [round(s, 1) for s in samples],
        }
        print(f"{name:18s} {fps:10.1f} frames/s "
              f"({1e3 * args.batch / fps:7.2f} ms/step)")
        if args.profile_dir and (name, n_critic, adv_w, mm, fwd) == grid[-1]:
            jax.profiler.start_trace(args.profile_dir)
            state, _ = timed(state, 5000)
            jax.profiler.stop_trace()
        del state, step

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(results, indent=1))
    print("wrote", args.out)


if __name__ == "__main__":
    main()
