"""tkinter GUI for 1:N voiceprint recognition with registration and a
streaming real-time mode (reference ``infer_recognition_gui.py``, including
its block-wise live recognition loop)."""

import argparse
import functools
import threading
import tkinter as tk
from tkinter import filedialog, messagebox, simpledialog

import numpy as np

from voiceprintrecognition_paddlepaddle_tpu.predict import Predictor
from voiceprintrecognition_paddlepaddle_tpu.utils.record import RecordAudio
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("configs",       str,   "configs/cam++.yml", "config file path")
add_arg("use_gpu",       bool,  True, "use the accelerator (TPU)")
add_arg("audio_db_path", str,   "audio_db/", "voiceprint database directory")
add_arg("threshold",     float, 0.6,  "recognition threshold")
add_arg("record_seconds", int,  3,    "seconds per recorded utterance")
add_arg("model_path",    str,   "models/CAMPPlus_Fbank/best_model/",
        "exported model directory")
args = parser.parse_args()
print_arguments(args=args)


class RecognitionGUI:
    def __init__(self, window):
        self.window = window
        window.title("voiceprint recognition")
        self.predictor = Predictor(configs=args.configs,
                                   model_path=args.model_path,
                                   threshold=args.threshold,
                                   audio_db_path=args.audio_db_path,
                                   use_gpu=args.use_gpu)
        self.recorder = RecordAudio()
        self.streaming = False

        tk.Button(window, text="register (record)",
                  command=self.register_record).grid(row=0, column=0)
        tk.Button(window, text="register (file)",
                  command=self.register_file).grid(row=0, column=1)
        tk.Button(window, text="recognise (record)",
                  command=self.recognise_record).grid(row=1, column=0)
        tk.Button(window, text="recognise (file)",
                  command=self.recognise_file).grid(row=1, column=1)
        self.stream_btn = tk.Button(window, text="start live recognition",
                                    command=self.toggle_stream)
        self.stream_btn.grid(row=2, column=0)
        tk.Button(window, text="remove user",
                  command=self.remove_user).grid(row=2, column=1)
        self.result = tk.Label(window, text="")
        self.result.grid(row=3, column=0, columnspan=2)

    def _show(self, name, score):
        if name:
            self.result.config(text=f"speaker: {name} ({score})")
        else:
            self.result.config(text="no matching user")

    def register_record(self):
        name = simpledialog.askstring("register", "user name:")
        if not name:
            return
        def run():
            audio = self.recorder.record(args.record_seconds)
            self.predictor.register(audio, user_name=name,
                                    sample_rate=self.recorder.sample_rate)
        threading.Thread(target=run, daemon=True).start()

    def register_file(self):
        path = filedialog.askopenfilename()
        name = simpledialog.askstring("register", "user name:")
        if path and name:
            self.predictor.register(path, user_name=name)

    def recognise_record(self):
        def run():
            audio = self.recorder.record(args.record_seconds)
            self._show(*self.predictor.recognition(
                audio, sample_rate=self.recorder.sample_rate))
        threading.Thread(target=run, daemon=True).start()

    def recognise_file(self):
        path = filedialog.askopenfilename()
        if path:
            self._show(*self.predictor.recognition(path))

    def toggle_stream(self):
        """Streaming mode: accumulate 1024-frame mic blocks into a sliding
        window and re-recognise continuously."""
        if self.streaming:
            self.streaming = False
            self.stream_btn.config(text="start live recognition")
            return
        self.streaming = True
        self.stream_btn.config(text="stop live recognition")

        def run():
            sr = self.recorder.sample_rate
            window = np.zeros(0, dtype=np.float32)
            try:
                import soundcard
                mic = soundcard.default_microphone()
                with mic.recorder(samplerate=sr, blocksize=1024) as rec:
                    while self.streaming:
                        block = rec.record(numframes=1024)
                        block = np.asarray(block, np.float32)
                        if block.ndim == 2:
                            block = block.mean(axis=1)
                        window = np.concatenate([window, block])[-sr * 3:]
                        if len(window) >= sr:
                            self._show(*self.predictor.recognition(
                                window.copy(), sample_rate=sr))
            except Exception as e:
                self.streaming = False
                messagebox.showerror("error", str(e))
        threading.Thread(target=run, daemon=True).start()

    def remove_user(self):
        name = simpledialog.askstring("remove", "user name:")
        if name:
            self.predictor.remove_user(name)


if __name__ == "__main__":
    root = tk.Tk()
    RecognitionGUI(root)
    root.mainloop()
