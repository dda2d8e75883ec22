#!/bin/bash
# Round-3 perf queue #3 — the PRNG lever.
#
# The optimized-HLO census (results/hlo_flat_fusions.json) shows the 4
# largest fusions in the step are the datagen normal draws: 272-op
# threefry+Box-Muller chains at 1M elements each (~11% of total
# op-elements, and pure VPU serial work on an op-issue-bound step).
# 'rbg' swaps bulk bit generation onto the TPU-native RngBitGenerator
# instruction (key derivation stays threefry); 'unsafe_rbg' also
# cheapens split/fold_in. Same recipe statistics, different stream.
#
# Baseline to beat: defaults (tf32x3_gp + outer_unroll 4) = 3.39e7
# (results/r3_perf_queue2.jsonl gp_ou4). Run when the chip is free: ~15 min.
set -u
cd "$(dirname "$0")/.."
out=results/r3_perf_queue3.jsonl
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

run defaults_confirm                      # tf32x3_gp + ou4, new defaults
run rbg            --prng rbg
run unsafe_rbg     --prng unsafe_rbg
run rbg_ou2        --prng rbg --outer_unroll 2
run unsafe_rbg_ou8 --prng unsafe_rbg --outer_unroll 8

echo "queue3 done -> $out" >&2
cat "$out"
