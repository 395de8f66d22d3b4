#!/bin/bash
# 3-stage training recipe (reference: scripts/train_obama_eo.sh):
# head -> lips LPIPS finetune -> torso (head frozen), then self-driven test.

set -e

# stage 1: head
python main.py data/obama/ --workspace trial_obama_eo/ -O --iters 200000

# stage 2: lips finetune (+50k iters, LPIPS on the lips rect).
# Pass calibrated perceptual-loss weights when available — without
# --lpips_weights the LPIPS term runs on uncalibrated random filters
# (a loud warning is logged): export LPIPS_WEIGHTS=path/to/lpips_alex.npz
python main.py data/obama/ --workspace trial_obama_eo/ -O --finetune_lips --iters 250000 \
    ${LPIPS_WEIGHTS:+--lpips_weights "$LPIPS_WEIGHTS"}

# stage 3: torso (warm start from the head checkpoint, head frozen)
python main.py data/obama/ --workspace trial_obama_eo_torso/ -O --torso --iters 200000 \
    --head_ckpt trial_obama_eo/checkpoints/ngp.npz

# self-driven test
python main.py data/obama/ --workspace trial_obama_eo_torso/ -O --torso --test
