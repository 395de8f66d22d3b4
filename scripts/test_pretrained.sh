#!/bin/bash
# Inference from a trained checkpoint + novel audio (reference:
# scripts/test_pretrained.sh). Imported reference torch checkpoints (.pth)
# load directly via the --ckpt path.

set -e

python infer.py \
    --pose data/obama.json \
    --ckpt pretrained/obama_eo.pth \
    --aud data/intro_eo.npy \
    --workspace trial_test \
    --bg_img data/bg.jpg \
    -O --torso --data_range 0 100

# merge audio with video
ffmpeg -y -i trial_test/results/ngp_ep0000.mp4 -i data/intro.wav \
    -c:v copy -c:a aac obama_eo_intro.mp4

# deepspeech-feature variant:
# python infer.py --pose data/obama.json --ckpt pretrained/obama.pth \
#     --aud data/intro.npy --workspace trial_test --bg_img data/bg.jpg \
#     -O --torso --data_range 0 100 --asr_model deepspeech
