"""Train a speaker-verification model (reference ``train.py`` CLI parity)."""

import argparse
import functools

from voiceprintrecognition_paddlepaddle_tpu.trainer import Trainer
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("configs",          str,  "configs/cam++.yml",      "config file path")
add_arg("data_augment_configs", str, "configs/augmentation.yml",
        "augmentation config file path")
add_arg("use_gpu",          bool, True,  "use the accelerator (TPU) for training")
add_arg("save_model_path",  str,  "models/",  "where to save checkpoints")
add_arg("log_dir",          str,  "log/", "TensorBoard log directory")
add_arg("resume_model",     str,  None,   "checkpoint to resume; None = auto")
add_arg("pretrained_model", str,  None,   "pretrained weights to start from")
add_arg("do_eval",          bool, True,   "evaluate at every epoch end")
args = parser.parse_args()
print_arguments(args=args)

trainer = Trainer(configs=args.configs, use_gpu=args.use_gpu,
                  data_augment_configs=args.data_augment_configs)
trainer.train(save_model_path=args.save_model_path,
              log_dir=args.log_dir,
              resume_model=args.resume_model,
              pretrained_model=args.pretrained_model,
              do_eval=args.do_eval)
