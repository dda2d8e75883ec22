#!/usr/bin/env python3
"""HBM/FLOP roofline of the round-3 headline train-step HLO.

Compiles the exact bench.py default configuration (flat layout, bf16
activation storage, bf16 model dots + tf32 GP chain, critic unroll 5) and
reports XLA's own cost analysis — bytes accessed and FLOPs per frame — and
the implied HBM-roofline ns/frame at the assumed v5e bandwidth. Compares
against the measured steady-state ns/frame so the gap to speed-of-light is
a recorded number rather than a guess (VERDICT round-2 #1 "done" criterion:
either >=2.5e7 frames/s or a committed profile analysis).

Writes results/perf_hlo_flat.json.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

HBM_GBPS = 819.0  # v5e HBM bandwidth
BATCH = 65536


def main():
    from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
    from ofdmgan_tpu.models.flat import (make_critic_flat_apply,
                                         make_generator_flat_apply)
    from ofdmgan_tpu.signal import DatagenConfig
    from ofdmgan_tpu.signal.datagen import synthetic_batch_flat
    from ofdmgan_tpu.training import (LossConfig, TrainState, make_adam,
                                      make_train_step)

    key = jax.random.PRNGKey(0)
    gen = MiniGenerator(act_dtype="bfloat16")
    critic = MiniDiscriminator(act_dtype="bfloat16")
    x0 = jnp.zeros((1, 16, 2), jnp.float32)
    tx_g, tx_d = make_adam(2e-4), make_adam(2e-4)
    state = TrainState.create(gen.init(key, x0), critic.init(key, x0, x0),
                              tx_g, tx_d)
    dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
    ga = make_generator_flat_apply(act_dtype="bfloat16")
    ca = make_critic_flat_apply(act_dtype="bfloat16")

    def batch_fn(k, n):
        return synthetic_batch_flat(k, n, dg)

    step = make_train_step(ga, ca, tx_g, tx_d, dg, LossConfig(),
                           batch_size=BATCH, scan_steps=128,
                           matmul_precision="bf16_tf32gp",
                           act_dtype="bfloat16", critic_unroll=5,
                           batch_fn=batch_fn)
    comp = step.lower(state, key).compile()
    ca_ = comp.cost_analysis()
    cost = ca_[0] if isinstance(ca_, (list, tuple)) else ca_
    frames = BATCH * 128
    bytes_f = cost.get("bytes accessed", 0.0) / frames
    flops_f = cost.get("flops", 0.0) / frames
    out = {
        "batch": BATCH,
        "scan_steps": 128,
        "config": "flat + bf16 storage + bf16 dots/tf32 GP + unroll 5 "
                  "(bench.py defaults)",
        "hbm_gbps_assumed": HBM_GBPS,
        "bytes_per_frame": bytes_f,
        "flops_per_frame": flops_f,
        "hbm_roofline_ns_per_frame": bytes_f / HBM_GBPS,
        "measured_ns_per_frame": 33.2,  # 3.01e7 frames/s headline
        "note": "bytes accessed is XLA's own HLO cost model (HBM operand "
                "traffic of the optimized module); roofline = bytes/BW.",
    }
    out["fraction_of_hbm_roofline"] = (
        out["hbm_roofline_ns_per_frame"] / out["measured_ns_per_frame"])
    Path("results/perf_hlo_flat.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
