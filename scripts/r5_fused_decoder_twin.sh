#!/bin/bash
# Round-5 (VERDICT item 4): full-scale quality twin for the fused-decoder
# TRAINING forward. The identity is exact in exact arithmetic and gradient
# parity is pinned at 5e-4 (tests/test_unet_infer.py); this twin closes the
# loop empirically at full scale: same seed, same supervised champion-style
# recipe, std vs fused forward, compared on the paired 51,200-frame eval.
#
# Short-budget variant of the champion recipe (60 epochs exercises two
# StepLR decays at lr_step 20); ~8 min/leg on chip at supervised f32.
set -u
cd "$(dirname "$0")/.."
outdir=${OUTDIR:-results/fused_decoder_twin}
EPOCHS=${EPOCHS:-60}
SPE=${SPE:-51200}
BATCH=${BATCH:-512}
FL=${FL:-1024}
EXTRA=${EXTRA:-}
# MM note: the fused decoder at FULL float32 (6-pass) matmul precision hits
# a pathological XLA compile on the axon compiler (>18 min, killed — the
# interleave stack/reshape multiplies the f32 conv rewriter's work); the
# twin therefore runs BOTH legs at tensorfloat32 — a same-precision pair
# is the valid std-vs-fused comparison, and tf32 is the measured-stable
# full-scale training precision anyway (results/full_train_speed_r5.json).
MM=${MM:-tensorfloat32}
mkdir -p "$outdir"

run_leg() {
  name="$1"; shift
  ck=/tmp/r5_fused_twin_$name
  echo "=== leg $name: $*" >&2
  timeout 7200 python train.py \
    --model full --synthetic --nonlinear \
    --adv_weight 0 --n_critic 0 --lr 2e-4 --lr_step 20 --lr_gamma 0.5 \
    --matmul_precision "$MM" \
    --batch_size "$BATCH" --samples_per_epoch "$SPE" --epochs "$EPOCHS" \
    --seed 0 --frame_length "$FL" $EXTRA "$@" \
    --checkpoint_dir "$ck" --skip_export \
    > "$outdir/train_$name.log" 2>&1 || { echo "leg $name FAILED" >&2; return 1; }
  sleep 10
  timeout 1800 python scripts/eval_checkpoint.py \
    --checkpoint "$ck/final_model" --model full --frame_length "$FL" $EXTRA \
    --nonlinear \
    > "$outdir/eval_$name.json" 2>"$outdir/eval_$name.err"
  sleep 10
}

run_leg std_$MM
run_leg fused_$MM --fused_decoder
echo "fused-decoder twin done -> $outdir" >&2
grep -H "l1\|identity" "$outdir"/eval_*.json 2>/dev/null | head
