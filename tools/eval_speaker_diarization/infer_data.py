"""Run diarization over the test list writing a hypothesis RTTM
(reference ``tools/eval_speaker_diarization/infer_data.py``)."""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from voiceprintrecognition_paddlepaddle_tpu.infer_utils.der import write_rttm
from voiceprintrecognition_paddlepaddle_tpu.predict import Predictor
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("configs",        str,   "../../configs/cam++.yml", "config file path")
add_arg("use_gpu",        bool,  True, "use the accelerator (TPU)")
add_arg("data_list_path", str,   "dataset/data_list.txt", "test audio list")
add_arg("result_path",    str,   "dataset/hypotheses.rttm", "output RTTM")
add_arg("audio_db_path",  str,   "dataset/audio_db/", "per-file audio_db root")
add_arg("threshold",      float, 0.6, "same-speaker threshold")
add_arg("model_path",     str,   "../../models/CAMPPlus_Fbank/best_model/",
        "exported model directory")
args = parser.parse_args()
print_arguments(args=args)

with open(args.data_list_path, "r", encoding="utf-8") as f_r, \
        open(args.result_path, "w", encoding="utf-8") as f_w:
    for line in f_r:
        audio_path, name = line.strip().split("\t")
        audio_db_path = os.path.join(args.audio_db_path, name)
        predictor = Predictor(configs=args.configs,
                              model_path=args.model_path,
                              threshold=args.threshold,
                              audio_db_path=audio_db_path,
                              use_gpu=args.use_gpu)
        results = predictor.speaker_diarization(audio_path,
                                                search_audio_db=True)
        write_rttm(f_w, name, results)
        index = os.path.join(audio_db_path, "audio_indexes.bin")
        if os.path.exists(index):
            os.remove(index)
