#!/bin/bash
# Round-4 queue 5: re-probe the byte/alternative levers AT the new
# operating point (the r4 defaults: premap + onehot + rbg + ou2 +
# ss2048, 5.07e7). Round 3 rejected fp8 storage / remat / the Pallas
# datagen kernel when the step was op-issue-bound at 3.8e7; the r4 step
# is 88% MXU-busy — different regime, so the rejections must be
# re-earned rather than carried over ("locally optimal != globally
# done", VERDICT r3).
set -u
cd "$(dirname "$0")/.."
out=results/r4_perf_queue5.jsonl
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

run defaults_confirm                          # 5.07e7 anchor
run fp8_storage      --act_dtype float8_e4m3fn
run remat            --remat
run pallas_datagen   --pallas_datagen
run cu6              --critic_unroll 6
run ss3072           --scan_steps 3072

echo "queue5 done -> $out" >&2
cat "$out"
