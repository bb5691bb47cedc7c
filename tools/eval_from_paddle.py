"""Turnkey parity run: paddle ``model.pdparams`` -> EER/MinDCF (or a 1:1
contrast score) in one command.

Chains the checkpoint converter (``tools/convert_paddle_checkpoint.py``)
with this framework's evaluator so the day a real reference checkpoint +
dataset arrives, the parity measurement is one command instead of glue
debugging (reference flow: ``/root/reference/eval.py:22-25`` loading
``ppvector/utils/checkpoint.py`` load_pretrained):

    # EER/MinDCF over the config's enroll/trials lists
    python tools/eval_from_paddle.py --configs configs/cam++.yml \
        --pdparams CAMPPlus_Fbank/best_model/model.pdparams

    # 1:1 contrast of two wavs (reference infer_contrast.py)
    python tools/eval_from_paddle.py --configs configs/cam++.yml \
        --pdparams model.pdparams --predict a.wav b.wav

The converted checkpoint is kept in ``--workdir`` (default: a temp dir)
for reuse with eval.py / infer_*.py.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--configs", required=True, help="model YAML (this repo)")
    ap.add_argument("--pdparams", required=True,
                    help="paddle model.pdparams from the reference")
    ap.add_argument("--workdir", default=None,
                    help="where the converted checkpoint is written "
                         "(default: a temp dir)")
    ap.add_argument("--predict", nargs=2, metavar=("A_WAV", "B_WAV"),
                    default=None,
                    help="score two wavs against each other instead of "
                         "running the enroll/trials EER evaluation")
    ap.add_argument("--threshold", type=float, default=0.6,
                    help="same-speaker decision threshold for --predict")
    ap.add_argument("--save_image_path", default=None,
                    help="optional DET-curve output dir (eval mode)")
    ap.add_argument("--use_gpu", type=lambda s: s.lower() != "false",
                    default=True, help="use the accelerator (TPU)")
    args = ap.parse_args(argv)

    from convert_paddle_checkpoint import main as convert_main

    workdir = args.workdir or tempfile.mkdtemp(prefix="paddle_ckpt_")
    convert_main(["--configs", args.configs, "--pdparams", args.pdparams,
                  "--output", workdir])

    if args.predict is not None:
        from voiceprintrecognition_paddlepaddle_tpu.predict import Predictor
        predictor = Predictor(configs=args.configs,
                              threshold=args.threshold,
                              model_path=workdir, use_gpu=args.use_gpu)
        score = predictor.contrast(args.predict[0], args.predict[1])
        same = bool(score > args.threshold)
        print(f"contrast score: {score:.5f} "
              f"({'same' if same else 'different'} speaker "
              f"@ threshold {args.threshold})")
        return {"score": float(score), "same_speaker": same,
                "checkpoint": workdir}

    from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer
    trainer = Trainer(configs=args.configs, use_gpu=args.use_gpu)
    eer, min_dcf, threshold = trainer.evaluate(
        resume_model=workdir, save_image_path=args.save_image_path)
    print(f"EER: {eer:.5f}, MinDCF: {min_dcf:.5f}, "
          f"threshold: {threshold:.2f}")
    print(f"converted checkpoint kept at: {workdir}")
    return {"eer": eer, "min_dcf": min_dcf, "threshold": threshold,
            "checkpoint": workdir}


if __name__ == "__main__":
    main()
