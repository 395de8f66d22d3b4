#!/usr/bin/env python
"""Offline data-pipeline CLI (reference: data_utils/process.py).

Runs the 9-task preprocessing graph on a talking-head video:
  1 audio extract, 2 audio features, 3 frame extract, 4 face parsing,
  5 background plate, 6 torso/gt split, 7 landmarks, 8 3DMM tracking,
  9 transforms json export.

End-to-end example (two weight files make tasks 4 and 8 self-contained):
  python process.py data/obama/obama.mp4 \
      --parsing_weights weights/79999_iter.pth \
      --basis_path weights/3DMM_info.npy --keys_path weights/keys_info.npy
"""

import argparse
import os

# backend override for CPU runs (see main.py: JAX_PLATFORMS alone is
# ignored once a site plugin registers)
if os.environ.get("RADNERF_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["RADNERF_PLATFORM"])

from radnerf_tpu.preprocess import run_pipeline


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", help="video file; the dataset is built in its directory")
    p.add_argument("--task", type=int, default=-1,
                   help="-1 = all tasks, or a single task id 1..9")
    p.add_argument("--asr", type=str, default="wav2vec",
                   choices=["wav2vec", "deepspeech"])
    p.add_argument("--asr_model", type=str,
                   default="cpierse/wav2vec2-large-xlsr-53-esperanto")
    p.add_argument("--parsing_weights", type=str, default="",
                   help="BiSeNet face-parsing checkpoint (task 4)")
    p.add_argument("--basis_path", type=str, default="",
                   help="LandmarkBasis npz or 3DMM_info.npy (task 8)")
    p.add_argument("--keys_path", type=str, default="",
                   help="keys_info.npy (only with the 3DMM_info.npy format)")
    p.add_argument("--topology_path", type=str, default="",
                   help="topology_info.npy: enables the photometric "
                        "refinement stage of task 8")
    args = p.parse_args()

    run_pipeline(
        args.path, task=args.task, asr=args.asr, asr_model=args.asr_model,
        parsing_weights=args.parsing_weights, basis_path=args.basis_path,
        keys_path=args.keys_path, topology_path=args.topology_path,
    )


if __name__ == "__main__":
    main()
