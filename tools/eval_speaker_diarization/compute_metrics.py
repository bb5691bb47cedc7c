"""Score hypothesis vs reference RTTMs: DER / false alarm / confusion /
missed detection (reference
``tools/eval_speaker_diarization/compute_metrics.py``, using the
self-contained DER implementation instead of pyannote)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from voiceprintrecognition_paddlepaddle_tpu.infer_utils.der import (
    diarization_error_rate, load_rttm)

references = load_rttm("dataset/references.rttm")
hypotheses = load_rttm("dataset/hypotheses.rttm")

false_alarms, confusions, missed, error_rates = [], [], [], []
for uri, reference in references.items():
    hypothesis = hypotheses.get(uri, [])
    result = diarization_error_rate(reference, hypothesis, detailed=True)
    print(uri, ":", result)
    false_alarms.append(result["false alarm"])
    confusions.append(result["confusion"])
    missed.append(result["missed detection"])
    error_rates.append(result["diarization error rate"])

print("False alarm:", round(sum(false_alarms) / len(false_alarms), 5))
print("Confusion:", round(sum(confusions) / len(confusions), 5))
print("Missed detection:", round(sum(missed) / len(missed), 5))
print("Diarization error rate:", round(sum(error_rates) / len(error_rates), 5))
