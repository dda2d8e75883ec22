#!/bin/bash
# Round-4 queue 2: knob re-tune around the queue-1 winner — premap +
# conv_expand onehot at 4.31e7 vs the r3 defaults' 3.72e7
# (results/r4_perf_queue.jsonl: premap with the DUS forward expansion
# LOSES at every knob; the matmul-form onehot expansion is what makes
# expansion-once pay). Then refresh the op-table attribution at the new
# best config for the round-4 analysis.
set -u
cd "$(dirname "$0")/.."
out=results/r4_perf_queue2.jsonl
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

P="--premap --conv_expand onehot"
run po            $P                      # 4.31e7 confirm
run po_ou2        $P --outer_unroll 2
run po_ou6        $P --outer_unroll 6
run po_ou8        $P --outer_unroll 8
run po_cu3        $P --critic_unroll 3
run po_cu7        $P --critic_unroll 7
run po_ss2048     $P --scan_steps 2048
run po_b32k       $P --batch 32768
run po_b98k       $P --batch 98304
run po_fuse       $P --fuse_realfake
run po_rbg        $P --prng unsafe_rbg
run onehot_only   --conv_expand onehot    # is it onehot alone? (r3 q5: wash)

echo "queue2 done -> $out" >&2
cat "$out"
