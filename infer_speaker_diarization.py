"""Speaker diarization on a long recording
(reference ``infer_speaker_diarization.py``)."""

import argparse
import functools

from voiceprintrecognition_paddlepaddle_tpu.predict import Predictor
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("configs",     str,  "configs/cam++.yml", "config file path")
add_arg("use_gpu",     bool, True, "use the accelerator (TPU)")
add_arg("audio_path",  str,  "dataset/test_long.wav", "audio to diarize")
add_arg("audio_db_path", str, "audio_db/", "voiceprint db (for naming speakers)")
add_arg("speaker_num", int,  None, "oracle speaker count (optional)")
add_arg("search_audio_db", bool, False,
        "name speakers by searching the voiceprint database")
add_arg("show_plot",   bool, False, "render the diarization timeline")
add_arg("threshold",   float, 0.6,
        "same-speaker decision threshold for audio-db matching "
        "(reference infer_speaker_diarization.py:19)")
add_arg("model_path",  str,  "models/CAMPPlus_Fbank/best_model/",
        "exported model directory")
args = parser.parse_args()
print_arguments(args=args)

predictor = Predictor(
    configs=args.configs, model_path=args.model_path, use_gpu=args.use_gpu,
    threshold=args.threshold,
    audio_db_path=args.audio_db_path if args.search_audio_db else None)
results = predictor.speaker_diarization(args.audio_path,
                                        speaker_num=args.speaker_num,
                                        search_audio_db=args.search_audio_db)
print("diarization results:")
for result in results:
    print(result)

if args.show_plot:
    from voiceprintrecognition_paddlepaddle_tpu.infer_utils.viewer import (
        PlotSpeaker)
    plot_speaker = PlotSpeaker(results, audio_path=args.audio_path)
    plot_speaker.draw("output/speaker_diarization.png")
