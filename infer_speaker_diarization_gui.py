"""tkinter GUI for speaker diarization with timeline rendering
(reference ``infer_speaker_diarization_gui.py``)."""

import argparse
import functools
import threading
import tkinter as tk
from tkinter import filedialog, messagebox

from voiceprintrecognition_paddlepaddle_tpu.infer_utils.viewer import PlotSpeaker
from voiceprintrecognition_paddlepaddle_tpu.predict import Predictor
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("configs",       str,  "configs/cam++.yml", "config file path")
add_arg("audio_path",    str,  "dataset/test_long.wav",
        "audio preselected in the file box")
add_arg("use_gpu",       bool, True, "use the accelerator (TPU)")
add_arg("audio_db_path", str,  "audio_db/", "voiceprint database directory")
add_arg("search_audio_db", bool, False, "name speakers from the database")
add_arg("speaker_num",   int,  None, "oracle speaker count (optional)")
add_arg("threshold",     float, 0.6,
        "same-speaker decision threshold for audio-db matching")
add_arg("model_path",    str,  "models/CAMPPlus_Fbank/best_model/",
        "exported model directory")
args = parser.parse_args()
print_arguments(args=args)


class DiarizationGUI:
    def __init__(self, window):
        self.window = window
        window.title("speaker diarization")
        self.predictor = Predictor(
            configs=args.configs, model_path=args.model_path,
            use_gpu=args.use_gpu, threshold=args.threshold,
            audio_db_path=(args.audio_db_path if args.search_audio_db
                           else None))
        self.path = tk.StringVar(value=args.audio_path)
        tk.Label(window, text="audio:").grid(row=0, column=0)
        tk.Entry(window, textvariable=self.path, width=50).grid(row=0, column=1)
        tk.Button(window, text="browse",
                  command=lambda: self.path.set(
                      filedialog.askopenfilename())).grid(row=0, column=2)
        tk.Label(window, text="speakers (blank=auto):").grid(row=1, column=0)
        self.spk_num = tk.StringVar(
            value="" if args.speaker_num is None else str(args.speaker_num))
        tk.Entry(window, textvariable=self.spk_num, width=6).grid(row=1,
                                                                  column=1)
        tk.Button(window, text="run diarization",
                  command=self.run).grid(row=2, column=1)
        self.text = tk.Text(window, width=70, height=15)
        self.text.grid(row=3, column=0, columnspan=3)

    def run(self):
        def task():
            try:
                spk = int(self.spk_num.get()) if self.spk_num.get() else None
                results = self.predictor.speaker_diarization(
                    self.path.get(), speaker_num=spk,
                    search_audio_db=args.search_audio_db)
                self.text.delete("1.0", tk.END)
                for r in results:
                    self.text.insert(tk.END, f"{r}\n")
                PlotSpeaker(results, audio_path=self.path.get()).show()
            except Exception as e:
                messagebox.showerror("error", str(e))
        threading.Thread(target=task, daemon=True).start()


if __name__ == "__main__":
    root = tk.Tk()
    DiarizationGUI(root)
    root.mainloop()
