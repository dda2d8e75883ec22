#!/bin/bash
# Regenerate the reference head-to-head from scratch (VERDICT round-1 item:
# the original comparison pointed at an ephemeral /tmp checkpoint).
#
# The reference's training is UNSEEDED (global numpy RNG, SURVEY.md §7.3),
# so a rerun produces a statistically-equivalent but not bit-identical
# checkpoint; the committed artifact results/reference_port/best_model.pt
# is the checkpoint the shipped parity_report.json was computed from.
# This script reproduces the full pipeline end to end:
#
#   1. copy the read-only reference and train it with its own recipe
#      (torch CPU, ~2 h):                 python train.py --synthetic --epochs 500
#   2. copy the trained best_model.pt into results/reference_port/
#   3. re-run the head-to-head:           compare_with_reference.py
set -ex
cd "$(dirname "$0")/.."
REFRUN=${REFRUN:-/tmp/refrun}
if [ ! -f "$REFRUN/checkpoints/best_model.pt" ]; then
  rm -rf "$REFRUN"
  cp -r /root/reference "$REFRUN"
  (cd "$REFRUN" && python train.py --synthetic --epochs 500)
fi
mkdir -p results/reference_port
cp "$REFRUN/checkpoints/best_model.pt" results/reference_port/best_model.pt
python compare_with_reference.py \
  --ours results/best_model_checkpoint \
  --reference results/reference_port/best_model.pt \
  --output results/parity_report.json
