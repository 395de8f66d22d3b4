#!/usr/bin/env python
"""Pure inference CLI: drive a trained avatar from a pose json + audio npy
(reference: test.py; scripts/test_pretrained.sh).

Example:
  python infer.py --pose data/obama.json --aud data/intro_eo.npy \
      --workspace trial_obama/ -O --torso --ckpt pretrained/obama_eo.pth
"""


from main import build_parser, options_from_args


def main():
    parser = build_parser()
    # pose is required here; path is not (no training data needed)
    for action in parser._actions:
        if action.dest == "path":
            action.nargs = "?"
            action.default = ""
    parser.add_argument("--pose", type=str, required=True, help="pose source json")
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

        asr = None
        if opt.asr:
            from radnerf_tpu.apps.asr import StreamingASR

            asr = StreamingASR(opt)
            asr.warm_up()
        app = InteractiveApp(opt, trainer, dataset, asr=asr)
        app.serve()  # MJPEG viewer at http://127.0.0.1:8965/
    else:
        trainer.test(dataset)


if __name__ == "__main__":
    main()
