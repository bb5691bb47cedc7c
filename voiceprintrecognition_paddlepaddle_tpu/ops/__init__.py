from .audio import AudioSegment
from .features import AudioFeaturizer

__all__ = ["AudioSegment", "AudioFeaturizer"]
