#!/bin/bash
# Round-4: the live cell of the adversarial-value matrix — FULL-scale
# (1024-sample, 3.94M-param) adversarial training on the fading task.
#
# Why: results/distributional_full_fading.json shows the supervised
# full-fading champion is distributionally COLLAPSED (output ~= 0; PSD gap
# 81 dB, amp-std ratio 1.4e-4) — its L1 "win" over identity is the
# zero-output posterior mean of an unidentifiable blind-phase task. The
# mini fading GAN-recipe twins are NOT collapsed (amp-std ratio 0.34,
# results/distributional_multipath_nonlinear.json), so full-scale
# adversarial training is the one configuration where the GAN term can
# demonstrate value at scale (VERDICT r3 item 4 follow-through).
#
# Recipe: the reference CWGAN-GP recipe (n_critic 5, adv 1.0, rec 100,
# Adam(0,0.9) 2e-4, StepLR — /root/reference config/config.yaml per
# SURVEY.md P24) at the full-scale champion's compute budget (batch 512,
# 51,200 frames/epoch, 400 epochs = 40k gen steps, StepLR 70/0.5).
#
# Needs the real chip (~1-1.5 h); supervised twin took 0.62 h at n_critic 1.
set -u
cd "$(dirname "$0")/.."
ckdir=${CKDIR:-/tmp/full_mp_nl_gan}
outdir=${OUTDIR:-results/full_fading_gan}
# CPU dress rehearsal of the exact command wiring:
#   EPOCHS=1 SPE=64 BATCH=16 FL=64 EXTRA="--platform cpu" bash scripts/r4_fading_gan_queue.sh
EPOCHS=${EPOCHS:-400}
SPE=${SPE:-51200}
BATCH=${BATCH:-512}
FL=${FL:-1024}
EXTRA=${EXTRA:-}
mkdir -p "$outdir"

echo "=== train: full U-Net, multipath+nonlinear, reference GAN recipe" >&2
timeout 14400 python train.py \
  --model full --synthetic --nonlinear --channel multipath \
  --adv_weight 1.0 --n_critic 5 --lr 2e-4 --lr_step 70 --lr_gamma 0.5 \
  --batch_size "$BATCH" --samples_per_epoch "$SPE" --epochs "$EPOCHS" \
  --seed 0 --frame_length "$FL" $EXTRA \
  --checkpoint_dir "$ckdir" --skip_export \
  > "$outdir/train.log" 2>&1
rc=$?
echo "train rc=$rc (log: $outdir/train.log)" >&2
[ $rc -ne 0 ] && exit $rc
sleep 20

echo "=== paired 51,200-frame eval" >&2
timeout 1800 python scripts/eval_checkpoint.py \
  --checkpoint "$ckdir/final_model" --model full --frame_length "$FL" $EXTRA \
  --nonlinear --channel multipath \
  > "$outdir/eval_final.txt" 2>&1
sleep 15

echo "=== archive champion params" >&2
timeout 1800 python scripts/extract_champion.py \
  --checkpoint "$ckdir/final_model" \
  --out "$outdir" \
  > "$outdir/extract.log" 2>&1 || true
sleep 15

echo "=== distributional suite: GAN vs collapsed supervised champion" >&2
timeout 3600 python scripts/distributional_report.py \
  --model full --frame_length "$FL" --nonlinear --channel multipath $EXTRA \
  --checkpoint gan_fading="$outdir/champion_params_g.npz" \
               supervised_fading=results/full_fading/champion_params_g.npz \
  --json results/distributional_full_fading_gan.json \
  > "$outdir/distributional.log" 2>&1
sleep 15

echo "=== pilot-protocol benchmark vs classical equalizers" >&2
timeout 3600 python benchmark_comparison.py \
  --model full --checkpoint "$outdir/champion_params_g.npz" --frame_length "$FL" \
  --nonlinear --channel multipath --protocol pilot \
  --output_dir "$outdir" $EXTRA ${BENCH_EXTRA:-} \
  > "$outdir/benchmark_pilot.txt" 2>&1

echo "fading-GAN queue done -> $outdir" >&2
