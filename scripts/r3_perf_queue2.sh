#!/bin/bash
# Round-3 perf queue #2 — follow-ups to results/r3_perf_queue.jsonl.
#
# What queue #1 established on the chip (results/r3_perf_queue.jsonl):
# byte-reducing levers LOST (fp8 storage 2.37e7, remat 2.30e7, packed
# 1.75-2.04e7 vs 3.11e7 defaults) while the pass-reducing lever WON
# (gp_tf32x3 3.25e7) — so the step is bound by op issue / VPU elementwise
# work, not HBM bytes (the device trace agrees: elementwise fusions ~58%
# of device time, matmuls ~13%, results/profile_step_flat.json).
#
# This queue measures the ILP lever that story predicts SHOULD win
# (outer_unroll: adjacent steps' datagen is data-independent and can
# overlap the serial update chain), confirms the combined candidate
# default (gp_tf32x3 + outer_unroll), and dumps the optimized HLO to name
# the dominant fusions.  Run when the chip is free: ~20 min.
set -u
cd "$(dirname "$0")/.."
out=results/r3_perf_queue2.jsonl
: > "$out"

run() {
  label="$1"; shift
  echo "=== $label: $*" >&2
  line=$(timeout 900 python bench.py "$@" 2>/dev/null | tail -1)
  case "$line" in
    "{"*) echo "{\"label\": \"$label\", \"result\": $line}" >> "$out" ;;
    *)    echo "{\"label\": \"$label\", \"error\": \"bench failed or timed out\"}" >> "$out" ;;
  esac
  echo "$label -> ${line:-FAILED}" >&2
  sleep 15
}

run gp_tf32x3_confirm   --mm tf32x3_gp
run gp_ou2              --mm tf32x3_gp --outer_unroll 2
run gp_ou4              --mm tf32x3_gp --outer_unroll 4
run defaults_ou2        --outer_unroll 2
run gp_ou2_cu1          --mm tf32x3_gp --outer_unroll 2 --critic_unroll 1

echo "=== optimized-HLO dump of the default + gp_tf32x3 configs" >&2
timeout 900 python scripts/hlo_dump_flat.py >&2 || \
  echo "hlo dump failed" >&2

echo "queue2 done -> $out" >&2
cat "$out"
