#!/bin/bash
# Round-5 queue 1: bank the 50M target beyond measurement noise (VERDICT
# item 1). The r4 margin is 1.4% — inside session noise (this session's
# cold re-run of the r4 defaults printed 5.04e7). Probes, in order of
# expected value from the r4 op table + this session's HLO read
# (/tmp/hlo_r5_headline.txt.gz):
#   - ss3072: measured 5.094e7 in r4 queue 3 and left on the table.
#   - ou3: re-probe at the current live-state size (r4 only tried 2/4/6/8).
#   - datagen_dtype bf16: intended to halve the datagen->model boundary
#     bytes; turned out to be a NO-OP (the step already casts the batch to
#     act_dtype) — rows kept in the jsonl as same-program controls.
set -u
cd "$(dirname "$0")/.."
out=results/r5_perf_queue.jsonl
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

run base_ss2048      --scan_steps 2048  # the r4 default, as the control (bench default is ss3072 since r5)
run ss3072           --scan_steps 3072
run ss3072_ou3       --scan_steps 3072 --outer_unroll 3
run ou3              --outer_unroll 3
# dg_bf16 rows (recorded in the jsonl) used a --datagen_dtype flag that was
# REMOVED post-hoc as a measured no-op: build_train_step already casts the
# batch to act_dtype at step entry, so those rows are same-program controls.

echo "queue done -> $out" >&2
cat "$out"
