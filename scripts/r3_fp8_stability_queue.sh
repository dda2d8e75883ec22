#!/bin/bash
# On-chip fp8-storage stability validation (round 3).
#
# The fp8 (float8_e4m3fn) activation-STORAGE runs in
# results/stability_evals_r3.json were CPU-backend: the storage lattice
# (explicit casts at every read site) is exactly simulated there, but CPU
# dots are f32, so the fp8-storage x bf16-MXU-dot interplay still needs
# real hardware. This queue runs the IDENTICAL full 500-epoch reference
# recipe (config defaults: batch 64, 10k samples/epoch, 78k steps) under
# the exact headline-analog config on the chip, then re-ranks the result
# on the paired 51,200-frame eval. Promotion rule: if the on-chip final
# val L1 lands within the f32 recipe spread (0.125 +/- 0.004) with W
# bounded, fp8 storage is validated as a bench default candidate.
#
# ~10-20 min on chip (tiny batch, dispatch-dominated). Run via
# scripts/tpu_watch.sh after the fading-full queue, or by hand.
set -u
cd "$(dirname "$0")/.."
ckdir=${CKDIR:-/tmp/fp8_tpu_stab}
outdir=${OUTDIR:-results/fp8_tpu_stability}
# Smoke-test knobs (CPU dress rehearsal of the exact command wiring):
#   EPOCHS=2 SPE=512 BATCH=64 EXTRA="--platform cpu" OUTDIR=/tmp/fp8_smoke \
#     CKDIR=/tmp/fp8_smoke_ck bash scripts/r3_fp8_stability_queue.sh
EPOCHS=${EPOCHS:-500}
SPE=${SPE:-10000}
BATCH=${BATCH:-64}
EXTRA=${EXTRA:-}
mkdir -p "$outdir"

echo "=== train: fp8_e4m3 storage, flat bf16_tf32gp headline config, full recipe (on chip)" >&2
timeout 7200 python train.py \
  --synthetic --flat --matmul_precision bf16_tf32gp \
  --act_dtype float8_e4m3fn --critic_unroll 5 \
  --epochs "$EPOCHS" --samples_per_epoch "$SPE" --batch_size "$BATCH" \
  --seed 0 $EXTRA \
  --checkpoint_dir "$ckdir" --skip_export \
  > "$outdir/train.log" 2>&1
rc=$?
echo "train rc=$rc (log: $outdir/train.log)" >&2
[ $rc -ne 0 ] && exit $rc
sleep 20

echo "=== paired 51,200-frame eval (final + best) vs CPU-backend twin" >&2
timeout 1800 python scripts/eval_checkpoint.py \
  --checkpoint "$ckdir/final_model" "$ckdir/best_model" --identity $EXTRA \
  > "$outdir/eval.txt" 2>&1 || true
cat "$outdir/eval.txt" >&2

echo "fp8 on-chip stability queue done -> $outdir" >&2
