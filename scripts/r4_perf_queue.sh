#!/bin/bash
# Round-4 TPU measurement queue: re-tune the knob set around the premapped
# expansion-once flat step (bench --premap, commit 343255f: 4.27e7 at the
# r3 knobs vs 3.80e7 without). The DUS/scatter category is gone from the
# step, so the ILP / dispatch / batch balance may have moved — re-probe
# each direction before flipping bench defaults.
# Run: bash scripts/r4_perf_queue.sh   (~45 min, exclusive chip)
set -u
cd "$(dirname "$0")/.."
out=results/r4_perf_queue.jsonl
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

run r3_defaults                                       # 3.80e7 confirm (no premap)
run premap            --premap                        # 4.27e7 confirm at r3 knobs
run premap_ou2        --premap --outer_unroll 2       # ILP rebalance without DUS
run premap_ou6        --premap --outer_unroll 6
run premap_ou8        --premap --outer_unroll 8
run premap_cu3        --premap --critic_unroll 3
run premap_cu7        --premap --critic_unroll 7
run premap_ss2048     --premap --scan_steps 2048      # dispatch amortization
run premap_b32k       --premap --batch 32768          # VMEM cliff may have moved
run premap_b98k       --premap --batch 98304
run premap_b131k      --premap --batch 131072
run premap_fuse       --premap --fuse_realfake        # [2B] rows: lost pre-premap
run premap_onehot     --premap --conv_expand onehot   # fwd expansion impl

echo "queue done -> $out" >&2
cat "$out"
