"""Microphone recording helper (reference ``ppvector/utils/record.py``).

The reference uses the ``soundcard`` package; this environment has no audio
stack, so the implementation degrades gracefully: if ``soundcard`` is
importable it records from the default mic, otherwise ``record()`` raises a
clear error (callers can pass file paths / arrays to the Predictor instead).
"""

import numpy as np

from .logger import logger

__all__ = ["RecordAudio"]


class RecordAudio:
    def __init__(self, channels=1, sample_rate=16000):
        self.channels = channels
        self.sample_rate = sample_rate
        try:
            import soundcard
            self._mic = soundcard.default_microphone()
        except Exception:
            self._mic = None
            logger.warning("no audio input device / soundcard package; "
                           "RecordAudio.record() is unavailable")

    def record(self, record_seconds=3, save_path=None):
        """Record ``record_seconds`` of mono float32 audio."""
        if self._mic is None:
            raise RuntimeError(
                "audio recording unavailable (no soundcard backend); "
                "pass a wav path or numpy array to the Predictor instead")
        print("start recording...")
        data = self._mic.record(samplerate=self.sample_rate,
                                numframes=self.sample_rate * record_seconds)
        audio = np.asarray(data, dtype=np.float32)
        if audio.ndim == 2:
            audio = audio.mean(axis=1)
        print("recording done")
        if save_path is not None:
            from ..ops.audio import AudioSegment
            AudioSegment(audio, self.sample_rate).to_wav_file(save_path)
        return audio
