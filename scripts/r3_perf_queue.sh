#!/bin/bash
# One-shot TPU measurement queue for the round-3 perf candidates.
# Run when the axon tunnel is back: bash scripts/r3_perf_queue.sh
# Each bench is ~2-4 min (compile + 8 windows); 15 s gaps let the
# exclusive chip tear down between processes (CLAUDE.md gotchas).
set -u
cd "$(dirname "$0")/.."
out=results/r3_perf_queue.jsonl
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

run baseline_defaults                 # 3.01e7 confirm
run remat            --remat          # fewer stored intermediates
run gp_tf32x3        --mm tf32x3_gp   # explicit 2-pass GP dots
run remat_gp         --remat --mm tf32x3_gp
run packed4_bf16     --packed 4       # packed inherits bf16 defaults now
run packed2_bf16     --packed 2
# fp8 activation STORAGE (stored float8, exact upcast into the same
# bf16-operand dots): halves the frame-tensor bytes again on a step at
# ~93% of HBM speed-of-light. Run only if the CPU stability eval
# (results/RESULTS.md §fp8 storage) cleared it.
run fp8_e4m3         --act_dtype float8_e4m3fn
run fp8_e4m3_remat   --act_dtype float8_e4m3fn --remat

echo "=== regenerate the HLO speed-of-light artifact (compile-only)" >&2
timeout 900 python scripts/perf_hlo_flat.py >&2 || \
  echo "perf_hlo_flat regeneration failed" >&2
sleep 15

echo "queue done -> $out" >&2
cat "$out"
