#!/usr/bin/env bash
# Faster-rcnn-style alternating training for EXACT trunk sharing
# (SURVEY.md §2.1 "Shared-trunk / combined eval"; the reference runs two
# separate nets — this chain produces one shared trunk so the fused
# single-program detect path serves at full quality):
#   A. FRCNN trunk warm-started from AZ, finetuned jointly
#   B. AZ heads retrained against the detector's FROZEN trunk
#   C. recall eval of the retrained AZ (proposal quality must hold)
#   D. fused shared-trunk detect eval (real mAP at fused speed)
# Prereqs: a trained AZ checkpoint + cached proposals (the first half of
# synthetic_hard_quality.sh).
# Usage: ./experiments/scripts/alternating_shared_trunk.sh [OUT] [AZ_ITERS] [FRCNN_ITERS]
set -euo pipefail
cd "$(dirname "$0")/../.."
LOG="experiments/logs/alternating_$(date +%Y%m%d_%H%M%S).log"
exec &> >(tee "$LOG")
CFG=${CFG:-experiments/cfgs/az_vgg_w100_synthetic_hard.yml}
OUT=${1:-output/quality_r3_w100}
AZ_ITERS=${2:-8000}
FRCNN_ITERS=${3:-6000}
PROP=${PROP:-$OUT/proposals_train.pkl}

python tools/train_net.py --net frcnn --imdb synthetic_hard_train --cfg $CFG \
    --iters "$FRCNN_ITERS" --output "$OUT/frcnn_alt" \
    --proposals "$PROP" \
    --init-trunk-from "$OUT/az" --trunk-trainable
sleep 20
python tools/train_net.py --net az --imdb synthetic_hard_train --cfg $CFG \
    --iters "$AZ_ITERS" --output "$OUT/az_alt" \
    --init-trunk-from "$OUT/frcnn_alt"
sleep 20
python tools/test_net.py --mode recall --imdb synthetic_hard_test --cfg $CFG \
    --ckpt "$OUT/az_alt" --batched
sleep 20
python tools/test_net.py --mode detect --imdb synthetic_hard_test --cfg $CFG \
    --ckpt "$OUT/az_alt" --frcnn-ckpt "$OUT/frcnn_alt" --share-trunk \
    --batched --output "$OUT/eval_alt"
