#!/bin/bash
# Round-3 perf queue #6 — remote-compiler option sweep.
#
# Client-side XLA_FLAGS do NOT reach the axon compile server, but
# jax.jit(compiler_options=...) travels with the compile request and IS
# validated there (probe: bogus flag -> remote HTTP 500). Candidates:
# - xla_tpu_scoped_vmem_limit_kib: the queue-4/5 story says 65536 rows
#   is a VMEM cliff; raising the scoped-vmem budget may move it (and
#   could even make batch 131072 viable).
# - xla_tpu_enable_while_loop_double_buffering: overlap adjacent while
#   iterations (complements outer_unroll).
# Unknown/invalid flags fail the compile fast (recorded as errors, fine).
#
# Baseline: defaults (ss1024) = 3.76-3.80e7 (r3_perf_queue5.jsonl).
set -u
cd "$(dirname "$0")/.."
out=results/r3_perf_queue6.jsonl
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

run vmem32m   --compiler_opts xla_tpu_scoped_vmem_limit_kib=32768
run vmem64m   --compiler_opts xla_tpu_scoped_vmem_limit_kib=65536
run vmem96m   --compiler_opts xla_tpu_scoped_vmem_limit_kib=98304
run wloop_db  --compiler_opts xla_tpu_enable_while_loop_double_buffering=true
run vmem64m_b128k --compiler_opts xla_tpu_scoped_vmem_limit_kib=65536 --batch 131072 --scan_steps 512

echo "queue6 done -> $out" >&2
cat "$out"
