"""1:N voiceprint recognition REPL over a persistent audio database
(reference ``infer_recognition.py``): record/load audio, register users,
recognise, delete."""

import argparse
import functools

from voiceprintrecognition_paddlepaddle_tpu.predict import Predictor
from voiceprintrecognition_paddlepaddle_tpu.utils.record import RecordAudio
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("configs",       str,   "configs/cam++.yml", "config file path")
add_arg("use_gpu",       bool,  True, "use the accelerator (TPU)")
add_arg("audio_db_path", str,   "audio_db/", "voiceprint database directory")
add_arg("record_seconds", int,  3,    "seconds to record per utterance")
add_arg("threshold",     float, 0.6,  "recognition threshold")
add_arg("model_path",    str,   "models/CAMPPlus_Fbank/best_model/",
        "exported model directory")
args = parser.parse_args()
print_arguments(args=args)

predictor = Predictor(configs=args.configs, model_path=args.model_path,
                      threshold=args.threshold,
                      audio_db_path=args.audio_db_path, use_gpu=args.use_gpu)
record_audio = RecordAudio()

while True:
    select_fun = int(input("select action: 0=register, 1=recognise, "
                           "2=remove user, 3=list users, 4=quit: "))
    if select_fun == 0:
        audio_data = record_audio.record(record_seconds=args.record_seconds)
        name = input("enter user name for registration: ")
        if name:
            predictor.register(audio_data, user_name=name,
                               sample_rate=record_audio.sample_rate)
    elif select_fun == 1:
        audio_data = record_audio.record(record_seconds=args.record_seconds)
        name, score = predictor.recognition(
            audio_data, sample_rate=record_audio.sample_rate)
        if name:
            print(f"recognised speaker: {name}, similarity: {score}")
        else:
            print("no matching user in the database")
    elif select_fun == 2:
        name = input("enter user name to remove: ")
        if name:
            predictor.remove_user(user_name=name)
    elif select_fun == 3:
        print("registered users:", predictor.get_users())
    else:
        break
