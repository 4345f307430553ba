#!/usr/bin/env bash
# Full VOC07 chain (requires data/VOCdevkit2007; reference flow).
set -euo pipefail
cd "$(dirname "$0")/../.."
LOG="experiments/logs/voc_$(date +%Y%m%d_%H%M%S).log"
exec &> >(tee "$LOG")
CFG=experiments/cfgs/az_vgg16_voc.yml
OUT=${1:-output/voc2007}

python tools/train_net.py --net az --imdb voc_2007_trainval --cfg $CFG --output "$OUT/az"
python tools/propose_net.py --imdb voc_2007_trainval --cfg $CFG --ckpt "$OUT/az" \
    --out "$OUT/proposals_trainval.pkl"
python tools/train_net.py --net frcnn --imdb voc_2007_trainval --cfg $CFG \
    --output "$OUT/frcnn" --proposals "$OUT/proposals_trainval.pkl"
python tools/test_net.py --mode recall --imdb voc_2007_test --cfg $CFG --ckpt "$OUT/az"
python tools/test_net.py --mode detect --imdb voc_2007_test --cfg $CFG \
    --ckpt "$OUT/az" --frcnn-ckpt "$OUT/frcnn" --output "$OUT/eval"
