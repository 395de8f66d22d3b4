#!/bin/bash
# End-to-end streaming test: live wav2vec ASR sliding-window features driving
# the 25 fps interactive frame loop (reference: scripts/test_streaming.sh;
# the DearPyGui window is replaced by the headless frame server — open
# http://127.0.0.1:8965/ for the MJPEG viewer).

set -e

python infer.py \
    --pose data/obama/transforms_train.json \
    --ckpt trial_obama_eo_torso/checkpoints/ngp.npz \
    --aud data/intro_eo.npy \
    --workspace trial_test \
    --bg_img data/obama/bc.jpg \
    -l 10 -m 10 -r 10 \
    -O --torso --data_range 0 100 --gui --asr
