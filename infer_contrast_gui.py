"""tkinter GUI for 1:1 voiceprint contrast
(reference ``infer_contrast_gui.py``)."""

import argparse
import functools
import threading
import tkinter as tk
from tkinter import filedialog, messagebox

from voiceprintrecognition_paddlepaddle_tpu.predict import Predictor
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import (
    add_arguments, print_arguments)

parser = argparse.ArgumentParser(description=__doc__)
add_arg = functools.partial(add_arguments, argparser=parser)
add_arg("configs",    str,   "configs/cam++.yml", "config file path")
add_arg("use_gpu",    bool,  True, "use the accelerator (TPU)")
add_arg("threshold",  float, 0.6,  "same-speaker decision threshold")
add_arg("model_path", str,   "models/CAMPPlus_Fbank/best_model/",
        "exported model directory")
args = parser.parse_args()
print_arguments(args=args)


class ContrastGUI:
    def __init__(self, window):
        self.window = window
        window.title("voiceprint contrast")
        self.predictor = Predictor(configs=args.configs,
                                   model_path=args.model_path,
                                   threshold=args.threshold,
                                   use_gpu=args.use_gpu)
        self.path1 = tk.StringVar()
        self.path2 = tk.StringVar()
        for row, (label, var) in enumerate(
                [("audio 1:", self.path1), ("audio 2:", self.path2)]):
            tk.Label(window, text=label).grid(row=row, column=0)
            tk.Entry(window, textvariable=var, width=50).grid(row=row, column=1)
            tk.Button(window, text="browse",
                      command=lambda v=var: v.set(
                          filedialog.askopenfilename())).grid(row=row, column=2)
        tk.Button(window, text="compare", command=self.compare).grid(
            row=2, column=1)
        self.result = tk.Label(window, text="")
        self.result.grid(row=3, column=1)

    def compare(self):
        def run():
            try:
                score = self.predictor.contrast(self.path1.get(),
                                                self.path2.get())
                verdict = ("SAME speaker" if score > args.threshold
                           else "DIFFERENT speakers")
                self.result.config(
                    text=f"{verdict} (similarity {score:.5f})")
            except Exception as e:
                messagebox.showerror("error", str(e))
        threading.Thread(target=run, daemon=True).start()


if __name__ == "__main__":
    root = tk.Tk()
    ContrastGUI(root)
    root.mainloop()
