#!/bin/bash
# Round-3 deferred item: the FULL-scale (1024-sample, 3.94M-param) model
# trained on the fading task where the learned equalizer structurally wins
# (frequency-selective multipath + nonlinear PA/IQ/PN — see the mini 2x2,
# results/RESULTS.md §Fading-channel models). Champion recipe carried over
# unchanged from the AWGN full champion (supervised L1, StepLR — the
# adversarial term costs L1 at this scale, §Full 1024): adv_weight 0,
# n_critic 1, lr 2e-4, StepLR 70/0.5, batch 512, 400 epochs = 40k steps.
#
# Needs the real chip (~1-2 h at 6.2k frames/s); run via scripts/tpu_watch.sh
# or by hand when the axon tunnel is alive.
set -u
cd "$(dirname "$0")/.."
ckdir=${CKDIR:-/tmp/full_mp_nl}
outdir=${OUTDIR:-results/full_fading}
# Smoke-test knobs (CPU dress rehearsal of the exact command wiring):
#   EPOCHS=1 SPE=64 BATCH=16 FL=64 EXTRA="--platform cpu" bash scripts/r3_fading_full_queue.sh
EPOCHS=${EPOCHS:-400}
SPE=${SPE:-51200}
BATCH=${BATCH:-512}
FL=${FL:-1024}
EXTRA=${EXTRA:-}
mkdir -p "$outdir"

echo "=== train: full U-Net, multipath+nonlinear, supervised champion recipe" >&2
timeout 14400 python train.py \
  --model full --synthetic --nonlinear --channel multipath \
  --adv_weight 0 --n_critic 1 --lr 2e-4 --lr_step 70 --lr_gamma 0.5 \
  --batch_size "$BATCH" --samples_per_epoch "$SPE" --epochs "$EPOCHS" \
  --seed 0 --frame_length "$FL" $EXTRA \
  --checkpoint_dir "$ckdir" --skip_export \
  > "$outdir/train.log" 2>&1
rc=$?
echo "train rc=$rc (log: $outdir/train.log)" >&2
[ $rc -ne 0 ] && exit $rc
sleep 20

echo "=== paired 51,200-frame eval (+ identity baseline)" >&2
timeout 1800 python scripts/eval_checkpoint.py \
  --checkpoint "$ckdir/final_model" --model full --frame_length "$FL" $EXTRA \
  --nonlinear --channel multipath \
  > "$outdir/eval_final.txt" 2>&1
sleep 15
timeout 1800 python scripts/eval_checkpoint.py \
  --identity --model full --frame_length "$FL" --nonlinear --channel multipath $EXTRA \
  > "$outdir/eval_identity.txt" 2>&1
sleep 15

echo "=== pilot-protocol benchmark vs classical equalizers" >&2
timeout 3600 python benchmark_comparison.py \
  --model full --checkpoint "$ckdir/final_model" --frame_length "$FL" \
  --nonlinear --channel multipath --protocol pilot \
  --output_dir "$outdir" $EXTRA ${BENCH_EXTRA:-} \
  > "$outdir/benchmark_pilot.txt" 2>&1
sleep 15

echo "=== archive champion params" >&2
timeout 1800 python scripts/extract_champion.py \
  --checkpoint "$ckdir/final_model" \
  --out "$outdir" \
  > "$outdir/extract.log" 2>&1 || true

echo "fading-full queue done -> $outdir" >&2
