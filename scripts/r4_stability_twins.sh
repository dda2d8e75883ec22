#!/bin/bash
# Round-4 stability twins with COMMITTED artifacts (VERDICT r3 items 1+3).
#
# Round 3 validated the bench-default config over the full 500-epoch
# reference recipe, but the twin checkpoints lived in /tmp and are gone
# (results/stability_evals_r3.json cites dead paths). This queue re-runs
# the twins and extracts the generator .npz into results/ so every
# stability number has a living artifact:
#
#   twin_tf32x3_gp : the r3 bench default — flat step, bf16 activation
#                    storage, ambient-bf16 model dots with the GP chain on
#                    explicit bf16x3 dots (--mm tf32x3_gp).
#   twin_premap    : the r4 headline — same + expansion-once premapped
#                    Toeplitz matrices with the scatter-free onehot
#                    backward (--premap --conv_expand onehot).
#
# CPU backend: the bf16/bf16x3 lattices are simulated exactly (explicit
# casts + tf32_matmul decomposition); what needs real hardware — the MXU
# dot interplay — was closed on-chip in round 3 for the non-premap config,
# and the premap step is the same function to rounding
# (tests/test_flat_model.py::test_full_step_premap*).
#
# Promotion rule (same as r3): final val L1 within the f32 recipe spread
# (0.125 +/- 0.004) on the paired 51,200-frame eval, W bounded.
set -u
cd "$(dirname "$0")/.."
EPOCHS=${EPOCHS:-500}
SPE=${SPE:-10000}
outdir=results/stability_twins_r4
mkdir -p "$outdir"

run_twin () {
  name=$1; shift
  SFX=""; [ "${SEED:-0}" != 0 ] && SFX="_s${SEED}"
  ck=/tmp/r4_twin_${name}_s${SEED:-0}
  echo "=== twin $name" >&2
  timeout 14400 python train.py \
    --synthetic --platform cpu --flat --mm tf32x3_gp \
    --matmul_precision bf16_tf32gp --act_dtype bfloat16 --critic_unroll 5 \
    --epochs "$EPOCHS" --samples_per_epoch "$SPE" --batch_size 64 --seed "${SEED:-0}" \
    --checkpoint_dir "$ck" --skip_export "$@" \
    > "$outdir/train_${name}$SFX.log" 2>&1 || { echo "twin $name FAILED" >&2; return 1; }
  python scripts/extract_champion.py --checkpoint "$ck/final_model" \
    --out "$outdir/${name}$SFX" --meta "{\"twin\": \"$name\"}" \
    >> "$outdir/train_${name}$SFX.log" 2>&1
  # eval BOTH the Orbax dir and the committed .npz (they must agree)
  python scripts/eval_checkpoint.py --platform cpu --identity \
    --checkpoint "$ck/final_model" "$outdir/${name}$SFX/champion_params_g.npz" \
    > "$outdir/${name}${SFX}_eval.json" 2>>"$outdir/train_${name}$SFX.log"
}

for t in ${TWINS:-tf32x3_gp premap premap_rbg}; do
  case "$t" in
    tf32x3_gp)  run_twin tf32x3_gp ;;
    premap)     run_twin premap --premap --conv_expand onehot ;;
    # the r4 headline: + hardware-RBG PRNG (bench --prng unsafe_rbg,
    # 4.91e7 on chip, results/r4_perf_queue2.jsonl). The CPU twin
    # exercises the recipe on the CPU RBG stream — same generator
    # family, different stream than the TPU's; what it validates is
    # that the recipe's equilibrium does not depend on the threefry
    # stream specifically.
    premap_rbg) run_twin premap_rbg --premap --conv_expand onehot \
                                    --prng unsafe_rbg ;;
    # safe-rbg variant: threefry key derivation kept, only bulk bit
    # generation uses the hardware RngBitGenerator
    premap_saferbg) run_twin premap_saferbg --premap --conv_expand onehot \
                                    --prng rbg ;;
    *) echo "unknown twin $t" >&2; exit 2 ;;
  esac
done
echo "=== twins done" >&2
