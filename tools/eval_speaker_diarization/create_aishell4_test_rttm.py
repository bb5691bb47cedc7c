"""Prepare AIShell-4 test references: merge per-file RTTMs, list the test
audio, and cut per-speaker enrollment audio into a per-file audio_db
(reference ``tools/eval_speaker_diarization/create_aishell4_test_rttm.py``)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from voiceprintrecognition_paddlepaddle_tpu.infer_utils.der import load_rttm
from voiceprintrecognition_paddlepaddle_tpu.ops.audio import AudioSegment


def create_rttm(annotation_dir, output_path):
    with open(output_path, "w", encoding="utf-8") as out:
        for file in sorted(os.listdir(annotation_dir)):
            if not file.endswith(".rttm"):
                continue
            with open(os.path.join(annotation_dir, file), "r",
                      encoding="utf-8") as f:
                out.write(f.read())


def create_audio_path_list(audio_dir, list_path):
    with open(list_path, "w", encoding="utf-8") as out:
        for file in sorted(os.listdir(audio_dir)):
            if not file.endswith((".flac", ".wav")):
                continue
            path = os.path.join(audio_dir, file).replace("\\", "/")
            out.write(f"{path}\t{file.rsplit('.', 1)[0]}\n")


def create_audio_db(data_list_path, rttm_path, output_dir):
    annotations = load_rttm(rttm_path)
    with open(data_list_path, "r", encoding="utf-8") as f:
        for line in f:
            audio_path, name = line.strip().split("\t")
            seg = AudioSegment.from_file(audio_path)
            sr, audio = seg.sample_rate, seg.samples
            for track, (start, end, label) in enumerate(
                    annotations.get(name, [])):
                if end - start < 0.3:
                    continue
                save_path = os.path.join(output_dir, name, label,
                                         f"{track}.wav")
                os.makedirs(os.path.dirname(save_path), exist_ok=True)
                AudioSegment(audio[int(start * sr):int(end * sr)],
                             sr).to_wav_file(save_path)


if __name__ == "__main__":
    create_rttm(annotation_dir="dataset/test/TextGrid",
                output_path="dataset/references.rttm")
    create_audio_path_list(audio_dir="dataset/test/wav",
                           list_path="dataset/data_list.txt")
    create_audio_db(data_list_path="dataset/data_list.txt",
                    rttm_path="dataset/references.rttm",
                    output_dir="dataset/audio_db/")
