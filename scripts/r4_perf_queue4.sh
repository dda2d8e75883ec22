#!/bin/bash
# Round-4 queue 4: the final headline selection. unsafe_rbg is
# DISQUALIFIED on quality (500-epoch twins at two seeds land at
# 0.1330/0.1333 val L1 vs the recipe spread 0.125±0.004 — the cheapened
# fold_in correlates the per-step datagen draws); the safe 'rbg' impl
# (threefry key derivation + hardware RngBitGenerator bulk bits) twins
# at 0.12510 (in-spread) and benches 4.95e7. Combine it with the ou2 and
# ss2048 micro-wins from queue 3, then profile the winner for the
# round-4 op table.
set -u
cd "$(dirname "$0")/.."
out=results/r4_perf_queue4.jsonl
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

P="--premap --conv_expand onehot --prng rbg"
run pr_ou2_ss2048   $P --outer_unroll 2 --scan_steps 2048
run pr_ou2          $P --outer_unroll 2
run pr_ss2048       $P --scan_steps 2048
run pr_ou2_ss4096   $P --outer_unroll 2 --scan_steps 4096

echo "=== op-table profile at the winning config" >&2
rm -rf /tmp/xprof_flat_r4
timeout 900 python bench.py $P --outer_unroll 2 --scan_steps 2048 \
  --profile_dir /tmp/xprof_flat_r4 >&2 || true
sleep 10
timeout 300 python scripts/xprof_op_table.py /tmp/xprof_flat_r4 \
  -o results/op_table_r4_headline.json >&2 || true

echo "queue4 done -> $out" >&2
cat "$out"
