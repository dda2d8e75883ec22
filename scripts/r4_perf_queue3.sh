#!/bin/bash
# Round-4 queue 3: combos around the queue-2 winner — premap + onehot +
# unsafe_rbg PRNG at 4.91e7 (results/r4_perf_queue2.jsonl; the hardware
# RBG was a wash at r3's DUS-bound step, but with the scatter work gone
# the threefry VPU cost is now on the critical path). Probe the remaining
# cross-terms, the safe-rbg variant, and premap's marginal value over
# onehot alone under rbg.
set -u
cd "$(dirname "$0")/.."
out=results/r4_perf_queue3.jsonl
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

P="--premap --conv_expand onehot --prng unsafe_rbg"
run por             $P                     # 4.91e7 confirm
run por_ou2         $P --outer_unroll 2
run por_ss2048      $P --scan_steps 2048
run por_ou2_ss2048  $P --outer_unroll 2 --scan_steps 2048
run por_cu7         $P --critic_unroll 7
run por_b32k        $P --batch 32768
run por_b98k        $P --batch 98304
run por_fuse        $P --fuse_realfake
run po_saferbg      --premap --conv_expand onehot --prng rbg
run onehot_rbg      --conv_expand onehot --prng unsafe_rbg

echo "queue3 done -> $out" >&2
cat "$out"
