#!/bin/bash
# Round-3 perf queue #4 — deeper unroll + batch re-sweep at the new config.
#
# Queue 2 showed the step is op-issue-bound and the ILP lever (outer
# unroll) wins; ou6/ou8 were never measured (queue 3's ou8 leg didn't
# run). And the round-2 batch sweep ("flat-topped at 65536") was done on
# the f32 matmul-roofline step — on an op-issue-bound step, larger
# batches amortize per-step issue cost, so the optimum may have moved.
# scan_steps is halved as batch doubles to keep ~equal device time per
# dispatch (and equal total frames per measurement window).
#
# Baseline to beat: defaults (tf32x3_gp + ou4, batch 65536, scan 128)
# = 3.35-3.39e7 (results/r3_perf_queue2/3.jsonl).
set -u
cd "$(dirname "$0")/.."
out=results/r3_perf_queue4.jsonl
: > "$out"

run() {
  label="$1"; shift
  echo "=== $label: $*" >&2
  line=$(timeout 900 python bench.py "$@" 2>/dev/null | tail -1)
  case "$line" in
    "{"*) echo "{\"label\": \"$label\", \"args\": \"$*\", \"result\": $line}" >> "$out" ;;
    *)    echo "{\"label\": \"$label\", \"args\": \"$*\", \"error\": \"bench failed or timed out\"}" >> "$out" ;;
  esac
  echo "$label -> ${line:-FAILED}" >&2
  sleep 15
}

run ou6            --outer_unroll 6
run ou8            --outer_unroll 8
run b128k          --batch 131072 --scan_steps 64
run b256k          --batch 262144 --scan_steps 32
run b128k_ou8      --batch 131072 --scan_steps 64 --outer_unroll 8
run b512k          --batch 524288 --scan_steps 16
run b32k           --batch 32768 --scan_steps 256

echo "queue4 done -> $out" >&2
cat "$out"
