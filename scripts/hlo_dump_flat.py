#!/usr/bin/env python3
"""Dump the OPTIMIZED HLO of the headline train step and summarize fusions.

The device trace (results/profile_step_flat.json) attributes ~58% of device
time to elementwise fusions — with one, ``broadcast_compare_fusion.6``
(5 calls/step, i.e. once per critic update), at ~19% alone — but trace event
names cannot tell us WHAT those fusions compute. This script compiles the
exact bench.py configurations, saves ``compiled.as_text()`` (the
post-optimization module the chip actually runs, fusion names matching the
trace), and writes a JSON index: per fusion instruction, the op mix and the
largest tensor shape inside its called computation.

Compile-only (~1-2 min on the chip). Outputs:
  results/hlo_flat_<cfg>.txt.gz     full optimized HLO
  results/hlo_flat_fusions.json     fusion name -> {ops, max_shape, n_ops}
"""
import gzip
import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

# CPU dress-rehearsal knobs: HLO_PLATFORM=cpu HLO_BATCH=256 HLO_SCAN=2
if os.environ.get("HLO_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["HLO_PLATFORM"])
BATCH = int(os.environ.get("HLO_BATCH", 65536))
SCAN = int(os.environ.get("HLO_SCAN", 128))


def build_step(mm: str):
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
    ca_gp = (make_critic_flat_apply(act_dtype="bfloat16", mm="tf32x3")
             if mm == "tf32x3_gp" else None)

    def batch_fn(k, n):
        return synthetic_batch_flat(k, n, dg)

    step = make_train_step(ga, ca, tx_g, tx_d, dg, LossConfig(),
                           batch_size=BATCH, scan_steps=SCAN,
                           matmul_precision="bf16_tf32gp",
                           act_dtype="bfloat16", critic_unroll=5,
                           batch_fn=batch_fn, critic_apply_gp=ca_gp)
    return step, state, key


_SHAPE_RE = re.compile(r"(?:bf16|f32|f16|f8e4m3fn|f8e5m2|s32|u32|pred|s8|u8)"
                       r"\[([0-9,]*)\]")


def _shape_elems(line: str) -> int:
    best = 0
    for m in _SHAPE_RE.finditer(line):
        dims = m.group(1)
        n = 1
        for d in dims.split(",") if dims else []:
            if d:
                n *= int(d)
        best = max(best, n)
    return best


def summarize(text: str) -> dict:
    """Index fusion instructions -> op mix of their called computations."""
    # computation name -> list of op names + max shape
    comps = {}
    cur = None
    for line in text.splitlines():
        m = re.match(r"%?([\w.\-]+) \([^)]*\) -> .* \{", line.strip())
        if m:
            cur = m.group(1)
            comps[cur] = {"ops": {}, "max_elems": 0, "n_ops": 0}
            continue
        if cur is None:
            continue
        s = line.strip()
        if s == "}":
            cur = None
            continue
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = \S+ ([\w\-]+)\(", s)
        if m:
            op = m.group(1)
            c = comps[cur]
            c["ops"][op] = c["ops"].get(op, 0) + 1
            c["n_ops"] += 1
            c["max_elems"] = max(c["max_elems"], _shape_elems(s))
    # fusion instruction -> its computation summary
    out = {}
    for m in re.finditer(
            r"%?([\w.\-]*fusion[\w.\-]*) = \S+ fusion\(.*calls=%?([\w.\-]+)",
            text):
        inst, comp = m.group(1), m.group(2)
        if comp in comps:
            out[inst] = comps[comp]
    return out


def main():
    Path("results").mkdir(exist_ok=True)
    index = {}
    for cfg, mm in (("default", "ambient"), ("gp_tf32x3", "tf32x3_gp")):
        step, state, key = build_step(mm)
        comp = step.lower(state, key).compile()
        text = comp.as_text()
        p = Path(f"results/hlo_flat_{cfg}.txt.gz")
        with gzip.open(p, "wt") as f:
            f.write(text)
        index[cfg] = summarize(text)
        print(f"{cfg}: HLO {len(text)/1e6:.1f} MB -> {p}, "
              f"{len(index[cfg])} fusions indexed")
    with open("results/hlo_flat_fusions.json", "w") as f:
        json.dump(index, f, indent=1)
    print("fusion index -> results/hlo_flat_fusions.json")


if __name__ == "__main__":
    main()
