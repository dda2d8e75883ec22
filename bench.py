#!/usr/bin/env python3
"""Headline benchmark: synthetic I/Q frames/sec/chip through the FULL fused
CWGAN-GP training step (on-device datagen + 5 critic updates with gradient
penalty + generator update), reference recipe hyperparameters.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}

vs_baseline is measured against the rebuild target of 50,000,000 frames/s
per chip (BASELINE.md "Rebuild targets"; the reference itself estimates only
~100,000 frames/s inference-only on its FPGA RTL, docs/math_foundation.py:320).
"""

import json
import time

BASELINE_FRAMES_PER_SEC = 50_000_000.0


def main():
    import jax
    import jax.numpy as jnp

    from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
    from ofdmgan_tpu.signal import DatagenConfig
    from ofdmgan_tpu.training import LossConfig, TrainState, make_adam, make_train_step

    key = jax.random.PRNGKey(0)
    gen, critic = MiniGenerator(), MiniDiscriminator()
    x0 = jnp.zeros((1, 16, 2), jnp.float32)
    tx_g, tx_d = make_adam(2e-4), make_adam(2e-4)
    state = TrainState.create(gen.init(key, x0), critic.init(key, x0, x0), tx_g, tx_d)

    batch, scan_steps = 262_144, 4
    step = make_train_step(
        gen.apply, critic.apply, tx_g, tx_d,
        DatagenConfig.make(frame_length=16, snr_range=(0, 30)),
        LossConfig(),  # n_critic=5, gp 10, rec 100 — the reference recipe
        batch_size=batch, scan_steps=scan_steps,
    )

    # compile + thorough warmup (the first post-compile windows run slower
    # while the runtime settles; measured steady-state is ~3-4x warmer)
    for i in range(4):
        state, metrics = step(state, jax.random.fold_in(key, 1000 + i))
    jax.block_until_ready(state)

    windows = []
    reps = 4
    for w in range(4):
        t0 = time.perf_counter()
        for i in range(reps):
            state, metrics = step(state, jax.random.fold_in(key, w * reps + i))
        jax.block_until_ready(state)
        windows.append(reps * scan_steps * batch / (time.perf_counter() - t0))
    windows.sort()
    frames_per_sec = windows[len(windows) // 2]  # median window
    assert all(
        jnp.isfinite(jax.device_get(v)) for v in metrics.values()
    ), "non-finite training metrics"

    print(json.dumps({
        "metric": "fused_wgan_gp_train_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec / BASELINE_FRAMES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
