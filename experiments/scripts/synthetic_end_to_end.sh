#!/usr/bin/env bash
# End-to-end chain on the synthetic dataset (reference experiments/scripts
# pattern: train AZ -> cache proposals -> train FRCNN -> eval mAP).
set -euo pipefail
cd "$(dirname "$0")/../.."
LOG="experiments/logs/synthetic_$(date +%Y%m%d_%H%M%S).log"
exec &> >(tee "$LOG")
CFG=experiments/cfgs/az_smallnet_synthetic.yml
ITERS=${1:-300}
OUT=${2:-output/synthetic}

python tools/train_net.py --cpu --net az --imdb synthetic_train --cfg $CFG \
    --iters "$ITERS" --output "$OUT/az"
python tools/propose_net.py --cpu --imdb synthetic_train --cfg $CFG \
    --ckpt "$OUT/az" --out "$OUT/proposals_train.pkl"
python tools/train_net.py --cpu --net frcnn --imdb synthetic_train --cfg $CFG \
    --iters "$ITERS" --output "$OUT/frcnn" --proposals "$OUT/proposals_train.pkl"
python tools/test_net.py --cpu --mode recall --imdb synthetic_test --cfg $CFG \
    --ckpt "$OUT/az"
python tools/test_net.py --cpu --mode detect --imdb synthetic_test --cfg $CFG \
    --ckpt "$OUT/az" --frcnn-ckpt "$OUT/frcnn" --output "$OUT/eval"
