"""Pre-extract features to .npy for faster training
(reference ``extract_features.py``)."""

import argparse
import functools

from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("configs",      str,  "configs/cam++.yml", "config file path")
add_arg("save_dir",     str,  "dataset/features",  "feature output directory")
add_arg("max_duration", int,  100, "max seconds of audio to featurize")
args = parser.parse_args()
print_arguments(args=args)

trainer = Trainer(configs=args.configs)
trainer.extract_features(save_dir=args.save_dir,
                         max_duration=args.max_duration)
