#!/bin/bash
# 3-stage training recipe, DeepSpeech audio-feature variant
# (reference: scripts/train_obama_ds.sh; audio_in_dim 29 via --asr_model).
# head -> lips LPIPS finetune -> torso (head frozen), then self-driven test.

set -e

# stage 1: head
python main.py data/obama/ --workspace trial_obama_ds/ -O --iters 200000 \
    --asr_model deepspeech

# stage 2: lips finetune (+50k iters, LPIPS on the lips rect).
# Pass calibrated perceptual-loss weights when available — without
# --lpips_weights the LPIPS term runs on uncalibrated random filters
# (a loud warning is logged): export LPIPS_WEIGHTS=path/to/lpips_alex.npz
python main.py data/obama/ --workspace trial_obama_ds/ -O --finetune_lips --iters 250000 \
    --asr_model deepspeech ${LPIPS_WEIGHTS:+--lpips_weights "$LPIPS_WEIGHTS"}

# stage 3: torso (warm start from the head checkpoint, head frozen)
python main.py data/obama/ --workspace trial_obama_ds_torso/ -O --torso --iters 200000 \
    --asr_model deepspeech --head_ckpt trial_obama_ds/checkpoints/ngp.npz

# self-driven test
python main.py data/obama/ --workspace trial_obama_ds_torso/ -O --torso --test \
    --asr_model deepspeech
