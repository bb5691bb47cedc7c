"""1:1 voiceprint contrast (reference ``infer_contrast.py``)."""

import argparse
import functools

from voiceprintrecognition_paddlepaddle_tpu.predict import Predictor
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("configs",    str,   "configs/cam++.yml", "config file path")
add_arg("use_gpu",    bool,  True,  "use the accelerator (TPU)")
add_arg("audio_path1", str,  "dataset/a_1.wav", "first audio")
add_arg("audio_path2", str,  "dataset/b_2.wav", "second audio")
add_arg("threshold",  float, 0.6,  "same-speaker decision threshold")
add_arg("model_path", str,   "models/CAMPPlus_Fbank/best_model/",
        "exported model directory")
args = parser.parse_args()
print_arguments(args=args)

predictor = Predictor(configs=args.configs, model_path=args.model_path,
                      threshold=args.threshold, use_gpu=args.use_gpu)
dist = predictor.contrast(args.audio_path1, args.audio_path2)
if dist > args.threshold:
    print(f"{args.audio_path1} and {args.audio_path2} are the SAME speaker, "
          f"similarity: {dist:.5f}")
else:
    print(f"{args.audio_path1} and {args.audio_path2} are DIFFERENT speakers, "
          f"similarity: {dist:.5f}")
