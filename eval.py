"""Evaluate EER / MinDCF on the enroll+trials lists (reference ``eval.py``)."""

import argparse
import functools
import time

from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer
from voiceprintrecognition_paddlepaddle_tpu.utils.logger import logger
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("configs",         str,  "configs/cam++.yml", "config file path")
add_arg("use_gpu",         bool, True, "use the accelerator (TPU)")
add_arg("save_image_path", str,  "output/images/", "where to save the DET plot")
add_arg("resume_model",    str,  "models/CAMPPlus_Fbank/best_model/",
        "model checkpoint to evaluate")
args = parser.parse_args()
print_arguments(args=args)

trainer = Trainer(configs=args.configs, use_gpu=args.use_gpu)
start = time.time()
eer, min_dcf, threshold = trainer.evaluate(
    resume_model=args.resume_model, save_image_path=args.save_image_path)
logger.info(f"eval time: {int(time.time() - start)}s, "
            f"threshold: {threshold:.2f}, EER: {eer:.5f}, "
            f"MinDCF: {min_dcf:.5f}")
