#!/usr/bin/env python3
"""Device-trace profile of the fused train step: which fusions actually burn
the time on the real chip?

The HLO cost analysis (scripts/perf_analysis.py) counts LOGICAL bytes/flops
per op and cannot see what XLA's fusions turn into real HBM traffic or VPU
time. This script records a jax.profiler trace of steady-state windows of the
SAME step bench.py times, parses the exported Chrome-trace JSON, and
aggregates device-track event durations by fusion/op name — the ground truth
for where the 50-ish ns/frame goes (VERDICT round 2 "what's weak" #1).

Usage:
  python scripts/profile_step.py --act_dtype bfloat16 \
      --matmul_precision bf16_tf32gp --out results/profile_step.json
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def aggregate_trace(trace_dir: str):
    """Parse the newest trace.json.gz under trace_dir; return per-event-name
    total duration (us) for device (TPU) tracks only."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # pid -> process name; device tracks are named like "/device:TPU:0" or
    # contain "TPU" / "xla" op streams
    pid_name = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_name[ev["pid"]] = ev["args"].get("name", "")
    device_pids = {pid for pid, name in pid_name.items()
                   if "TPU" in name or "tpu" in name or "Device" in name.lower()}
    totals = collections.Counter()
    counts = collections.Counter()
    wall_span = [float("inf"), 0.0]
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))
        ts = float(ev.get("ts", 0.0))
        totals[name] += dur
        counts[name] += 1
        wall_span[0] = min(wall_span[0], ts)
        wall_span[1] = max(wall_span[1], ts + dur)
    return totals, counts, pid_name, wall_span


GROUPS = [
    ("matmul/conv", re.compile(r"dot|conv|gemm|matmul", re.I)),
    ("rng/threefry", re.compile(r"threefry|rng|random|shift|xor", re.I)),
    ("fusion (elementwise)", re.compile(r"^(loop_)?fusion", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
    ("scan/while overhead", re.compile(r"while|condition|body", re.I)),
    ("infeed/outfeed/host", re.compile(r"infeed|outfeed|transfer", re.I)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--scan_steps", type=int, default=32)
    ap.add_argument("--act_dtype", default=None, choices=[None, "bfloat16"])
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--mm", default="ambient", choices=["ambient", "tf32x3"])
    ap.add_argument("--critic_unroll", type=int, default=1)
    ap.add_argument("--matmul_precision", default="tensorfloat32")
    ap.add_argument("--trace_dir", default="/tmp/step_trace")
    ap.add_argument("--out", default="results/profile_step.json")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
    from ofdmgan_tpu.signal import DatagenConfig
    from ofdmgan_tpu.training import (LossConfig, TrainState, make_adam,
                                      make_train_step)

    key = jax.random.PRNGKey(0)
    gen = MiniGenerator(act_dtype=args.act_dtype)
    critic = MiniDiscriminator(act_dtype=args.act_dtype)
    x0 = jnp.zeros((1, 16, 2), jnp.float32)
    tx_g, tx_d = make_adam(2e-4), make_adam(2e-4)
    state = TrainState.create(gen.init(key, x0), critic.init(key, x0, x0),
                              tx_g, tx_d)
    dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
    gen_apply, critic_apply, batch_fn = gen.apply, critic.apply, None
    if args.flat:
        from ofdmgan_tpu.models.flat import (make_critic_flat_apply,
                                             make_generator_flat_apply)
        from ofdmgan_tpu.signal.datagen import synthetic_batch_flat
        gen_apply = make_generator_flat_apply(act_dtype=args.act_dtype,
                                              mm=args.mm)
        critic_apply = make_critic_flat_apply(act_dtype=args.act_dtype,
                                              mm=args.mm)
        batch_fn = lambda k, n: synthetic_batch_flat(k, n, dg)
    step = make_train_step(
        gen_apply, critic_apply, tx_g, tx_d, dg, LossConfig(),
        batch_size=args.batch, scan_steps=args.scan_steps,
        matmul_precision=args.matmul_precision, act_dtype=args.act_dtype,
        batch_fn=batch_fn, critic_unroll=args.critic_unroll)

    def run(state, seed):
        state, metrics = step(state, jax.random.fold_in(key, seed))
        jax.device_get(metrics["d_loss"])  # hard sync
        return state

    for w in range(3):  # compile + warmup
        state = run(state, 100 + w)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        state = run(state, 999)
    wall = time.perf_counter() - t0
    frames = args.batch * args.scan_steps

    totals, counts, pid_name, span = aggregate_trace(args.trace_dir)
    device_total_us = sum(totals.values())
    print(f"window wall {wall*1e3:.1f} ms; device events total "
          f"{device_total_us/1e3:.1f} ms over span "
          f"{(span[1]-span[0])/1e3:.1f} ms; {frames} frames "
          f"({wall/frames*1e9:.1f} ns/frame wall)")
    print(f"process tracks: {pid_name}")

    grouped = collections.Counter()
    for name, us in totals.items():
        for gname, pat in GROUPS:
            if pat.search(name):
                grouped[gname] += us
                break
        else:
            grouped["other"] += us

    rows = []
    print(f"\n{'us total':>12} {'%dev':>6} {'calls':>7}  name")
    for name, us in totals.most_common(args.top):
        pct = 100.0 * us / max(device_total_us, 1e-9)
        print(f"{us:12.0f} {pct:6.2f} {counts[name]:7d}  {name[:110]}")
        rows.append({"name": name, "us": us, "pct": round(pct, 3),
                     "calls": counts[name]})

    print("\ngrouped:")
    for gname, us in grouped.most_common():
        print(f"  {gname:24s} {us:12.0f} us "
              f"{100.0*us/max(device_total_us,1e-9):6.2f}%")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({
            "config": {"batch": args.batch, "scan_steps": args.scan_steps,
                       "act_dtype": args.act_dtype,
                       "matmul_precision": args.matmul_precision,
                       "flat": args.flat, "mm": args.mm,
                       "critic_unroll": args.critic_unroll},
            "window_wall_s": wall,
            "frames": frames,
            "ns_per_frame_wall": wall / frames * 1e9,
            "device_total_us": device_total_us,
            "grouped_us": dict(grouped),
            "top_ops": rows,
        }, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
