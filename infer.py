#!/usr/bin/env python
"""Pure inference CLI: drive a trained avatar from a pose json + audio npy
(reference: test.py; scripts/test_pretrained.sh).

Example:
  python infer.py --pose data/obama.json --aud data/intro_eo.npy \
      --workspace trial_obama/ -O --torso --ckpt pretrained/obama_eo.pth
"""

import argparse

from main import build_parser, options_from_args


def main():
    base = build_parser()
    # pose is required here; path is not (no training data needed)
    parser = argparse.ArgumentParser(parents=[base], add_help=False, conflict_handler="resolve")
    parser.add_argument("path", type=str, nargs="?", default="")
    parser.add_argument("--pose", type=str, required=True, help="pose source json")
    parser.add_argument("--aud", type=str, default="", help="audio feature npy")
    args = parser.parse_args()
    if not args.asr and not args.aud:
        parser.error("--aud is required unless --asr streaming is enabled")

    opt = options_from_args(args)
    opt.pose = args.pose
    opt.apply_test_mode()  # test.py:113-119 forces smoothing at test

    from radnerf_tpu.data import PoseAudioDataset
    from radnerf_tpu.train import Trainer

    trainer = Trainer("ngp", opt, metrics=[], workspace=opt.workspace,
                      use_checkpoint=opt.ckpt)
    dataset = PoseAudioDataset(opt)

    if opt.gui:
        from radnerf_tpu.apps.frame_server import InteractiveApp

        InteractiveApp(opt, trainer, dataset).run()
    else:
        trainer.test(dataset)


if __name__ == "__main__":
    main()
