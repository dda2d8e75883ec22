#!/bin/bash
# Full-U-Net supervised-champion precision twins (round 3, fast-path study).
#
# The n_critic=0 fast path reproduces the f32 champion trajectory bit-exactly
# (tests/test_training.py::test_supervised_fast_path_bit_exact), so only the
# CHEAPER precisions need fresh quality evidence. Runs the exact champion
# recipe (sup_decay_seed2.log: 400 epochs, batch 512, 100 steps/epoch,
# scan 25, lr 2e-4, StepLR 70/0.5, seed 2, nonlinear PA 0.8) at
# tensorfloat32 and bfloat16 matmuls with the supervised fast path, then the
# honest paired 51,200-frame eval for each.
#
# Also re-measures the as-run baseline row for the throughput table.
set -u
cd "$(dirname "$0")/.."
mkdir -p results/full_precision_twins

run_twin() {
  local mm="$1" tag="$2"
  echo "=== twin $tag ($mm) $(date -u +%H:%M:%S) ==="
  timeout 3600 python train.py --model full --nonlinear --pa_saturation 0.8 \
    --epochs 400 --batch_size 512 --samples_per_epoch 51200 --scan_steps 25 \
    --n_critic 0 --adv_weight 0 --lr 2e-4 --lr_step 70 --lr_gamma 0.5 \
    --seed 2 --matmul_precision "$mm" --skip_export \
    --checkpoint_dir "/tmp/full_sup_$tag" --experiment "full_sup_$tag" \
    > "results/full_precision_twins/train_$tag.log" 2>&1
  echo "train rc=$?"
  timeout 1200 python scripts/eval_checkpoint.py --model full --nonlinear \
    --checkpoint "/tmp/full_sup_$tag/final_model" \
    > "results/full_precision_twins/eval_$tag.out" 2> "results/full_precision_twins/eval_$tag.log"
  echo "eval rc=$?"
  python scripts/extract_champion.py --checkpoint "/tmp/full_sup_$tag/final_model" \
    --out "results/full_precision_twins/champion_$tag" \
    >> "results/full_precision_twins/eval_$tag.log" 2>&1 || true
}

timeout 1200 python scripts/bench_full_train.py \
  --configs asrun_champion_f32 \
  --out results/full_train_speed_asrun.json \
  > results/full_precision_twins/bench_asrun.log 2>&1
echo "asrun bench rc=$?"

run_twin tensorfloat32 tf32
run_twin bfloat16 bf16
echo "ALL DONE $(date -u +%H:%M:%S)"
