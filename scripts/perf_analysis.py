#!/usr/bin/env python3
"""Compiled-program analysis of the fused train step: where does the time go?

Produces the op-level evidence for the perf work (VERDICT round 2 #1): for
each step variant (unpacked/packed x precision), compiles the single-step
program on the attached backend and reports XLA's own cost analysis
(FLOPs, bytes accessed), the fusion inventory from the optimized HLO, and
the implied roofline times at the chip's peak numbers — so the measured
ns/frame can be decomposed into MXU-bound vs HBM-bound components without
needing an interactive profiler over the remote tunnel.

Writes a markdown report + JSON. Run on the TPU (compile-only; executes
nothing but one tiny warmup when --measure is given).
"""

import argparse
import json
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# v5e peak numbers (public: ~197 TFLOP/s bf16, ~99 TF/s "f32 via 6-pass" is
# not a real mode — use per-pass MXU rate; HBM ~819 GB/s)
HBM_GBPS = 819.0


_DTYPE_BYTES = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1}


def _shape_bytes(shape_str):
    """Bytes of one HLO shape literal like 'f32[65536,16,2]' (0 for tuples)."""
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m or m.group(1) not in _DTYPE_BYTES:
        return 0
    dims = [int(d) for d in m.group(2).split(",") if d] or [1]
    n = 1
    for d in dims:
        n *= d
    return n * _DTYPE_BYTES[m.group(1)]


def analyze(step_fn, state, key, label, batch, n_steps=1):
    import jax

    lowered = jax.jit(step_fn, donate_argnums=0).lower(state, key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    hlo = compiled.as_text()

    # inventory: opcode histogram of the optimized module (HLO text is
    # `%name = f32[...]{...} opcode(...)` — opcode follows the shape)
    ops = Counter(re.findall(r"=\s+(?:\([^)]*\)|[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?)\s+([a-z][a-z0-9\-]*)\(", hlo))

    # per-op OUTPUT bytes, ranked: where do the materialized tensors live?
    # (entry-computation root lines only would under-count; sum every
    # non-nested instruction's output — nested fusion bodies are indented
    # more than 4 spaces in the text dump, top-level two-space lines count)
    out_bytes = Counter()
    for m in re.finditer(
            r"^  %?[\w.\-]+ = ([a-z0-9]+\[[0-9,]*\])(?:\{[^}]*\})? ([a-z][a-z0-9\-]*)\(",
            hlo, re.M):
        out_bytes[m.group(2)] += _shape_bytes(m.group(1))
    top_outputs = []
    for m in re.finditer(
            r"^  %?([\w.\-]+) = ([a-z0-9]+\[[0-9,]*\])(?:\{[^}]*\})? ([a-z][a-z0-9\-]*)\(",
            hlo, re.M):
        top_outputs.append((_shape_bytes(m.group(2)), m.group(1),
                            m.group(3), m.group(2)))
    top_outputs.sort(reverse=True)

    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    frames = batch * n_steps
    report = {
        "label": label,
        "flops": flops,
        "bytes_accessed": bytes_acc,
        "flops_per_frame": flops / frames,
        "bytes_per_frame": bytes_acc / frames,
        "hbm_roofline_ns_per_frame": bytes_acc / frames / HBM_GBPS,
        "op_histogram": dict(ops.most_common(20)),
        "n_fusions": ops.get("fusion", 0),
        "output_bytes_by_opcode": {k: v for k, v in out_bytes.most_common(12)},
        "top_output_tensors": [
            {"bytes": b, "name": n, "op": o, "shape": s}
            for b, n, o, s in top_outputs[:25]],
    }
    return report, hlo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--packed", type=int, nargs="*", default=[0, 4])
    ap.add_argument("--precision", default="tensorfloat32")
    ap.add_argument("--act_dtype", default=None, choices=[None, "bfloat16"],
                    help="activation storage dtype for the unpacked variant")
    ap.add_argument("--out", default="results/perf_hlo_analysis.json")
    ap.add_argument("--dump_hlo_dir", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ofdmgan_tpu.models import MiniDiscriminator, MiniGenerator
    from ofdmgan_tpu.signal import DatagenConfig
    from ofdmgan_tpu.training import LossConfig, TrainState, make_adam
    from ofdmgan_tpu.training.wgan_gp import build_train_step
    from ofdmgan_tpu.ops.packed_step import build_packed_train_step

    key = jax.random.PRNGKey(0)
    gen = MiniGenerator(act_dtype=args.act_dtype)
    critic = MiniDiscriminator(act_dtype=args.act_dtype)
    x0 = jnp.zeros((1, 16, 2), jnp.float32)
    tx_g, tx_d = make_adam(2e-4), make_adam(2e-4)
    state = TrainState.create(gen.init(key, x0), critic.init(key, x0, x0),
                              tx_g, tx_d)
    dg = DatagenConfig.make(frame_length=16, snr_range=(0, 30))
    loss_cfg = LossConfig()

    reports = []
    for p in args.packed:
        if p:
            step = build_packed_train_step(
                tx_g, tx_d, dg, loss_cfg, args.batch, p=p,
                matmul_precision=args.precision)
            label = f"packed_p{p}_{args.precision}"
        else:
            step = build_train_step(
                gen.apply, critic.apply, tx_g, tx_d, dg, loss_cfg, args.batch,
                matmul_precision=args.precision, act_dtype=args.act_dtype)
            label = f"unpacked_{args.precision}" + (
                f"_act{args.act_dtype}" if args.act_dtype else "")
        print(f"compiling {label} (batch {args.batch})...", flush=True)
        rep, hlo = analyze(step, state, key, label, args.batch)
        reports.append(rep)
        print(json.dumps(rep, indent=2), flush=True)
        if args.dump_hlo_dir:
            d = Path(args.dump_hlo_dir)
            d.mkdir(parents=True, exist_ok=True)
            (d / f"{label}.hlo.txt").write_text(hlo)

    Path(args.out).write_text(json.dumps(
        {"batch": args.batch, "hbm_gbps_assumed": HBM_GBPS,
         "variants": reports}, indent=2))
    print(f"written: {args.out}")


if __name__ == "__main__":
    main()
