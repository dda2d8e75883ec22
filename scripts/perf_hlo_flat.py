#!/usr/bin/env python3
"""HBM roofline of the round-3 headline train-step HLO (bench.py defaults).

Compiles the exact default bench configuration (flat layout, bf16
activation storage, bf16 model dots + tf32 GP chain, critic unroll 5) and
reconciles XLA's own cost model against the measured wall time:

* ``bytes accessed`` sums every fusion's operands+outputs. Adjacent fusions
  share each materialized intermediate (producer output == consumer input),
  so UNIQUE HBM traffic is ~cost/2.
* The scan body is counted once by the cost model; scale by scan_steps.
* Speed-of-light check: measured_step_time * HBM_BW vs unique bytes. When
  they agree (~1.0 fraction), the step is bandwidth-saturated for its
  logical dataflow and further gains require FEWER BYTES (fewer
  materialized intermediates / narrower storage), not better scheduling.

Round-3 measurement (v5e, batch 65536): cost 3.3 GB/step counted, ~1.65 GB
unique; measured 2.08 ms/step * 819 GB/s = 1.70 GB moved -> the XLA
lowering runs at ~100% of achievable HBM bandwidth. Recorded in
results/perf_hlo_flat.json; discussion in results/RESULTS.md §Round 3.

Run on the TPU (compile-only, ~1 min).
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

HBM_GBPS = 819.0  # v5e HBM bandwidth
BATCH = 65536
SCAN = 128
MEASURED_NS_PER_FRAME = 33.2  # 3.01e7 frames/s headline (bench.py defaults)


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
                           batch_size=BATCH, scan_steps=SCAN,
                           matmul_precision="bf16_tf32gp",
                           act_dtype="bfloat16", critic_unroll=5,
                           batch_fn=batch_fn)
    comp = step.lower(state, key).compile()
    ca_ = comp.cost_analysis()
    cost = ca_[0] if isinstance(ca_, (list, tuple)) else ca_
    # the scan body is counted ONCE by the cost model -> per-step values
    bytes_step_counted = cost.get("bytes accessed", 0.0)
    flops_step = cost.get("flops", 0.0)
    bytes_step_unique = bytes_step_counted / 2.0  # producer+consumer counted
    measured_step_s = MEASURED_NS_PER_FRAME * 1e-9 * BATCH
    measured_bytes_capacity = measured_step_s * HBM_GBPS * 1e9
    out = {
        "batch": BATCH,
        "config": "flat + bf16 storage + bf16 dots/tf32 GP + unroll 5 "
                  "(bench.py defaults)",
        "hbm_gbps_assumed": HBM_GBPS,
        "cost_bytes_per_step_counted": bytes_step_counted,
        "cost_bytes_per_step_unique_est": bytes_step_unique,
        "cost_flops_per_step": flops_step,
        "measured_ns_per_frame": MEASURED_NS_PER_FRAME,
        "measured_step_ms": measured_step_s * 1e3,
        "measured_bytes_capacity_per_step": measured_bytes_capacity,
        "fraction_of_hbm_speed_of_light":
            bytes_step_unique / measured_bytes_capacity,
        "bytes_per_frame_unique": bytes_step_unique / BATCH,
        "note": "fraction ~1.0 => the lowering saturates HBM for its "
                "logical dataflow; next gains need fewer bytes, not "
                "better scheduling.",
    }
    Path("results/perf_hlo_flat.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
