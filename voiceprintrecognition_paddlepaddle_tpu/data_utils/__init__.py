from ..ops.features import AudioFeaturizer
from .collate import collate_features, collate_waveforms
from .loader import DataLoader
from .pk_sampler import PKSampler
from .reader import SpeakerDataset

__all__ = ["AudioFeaturizer", "SpeakerDataset", "DataLoader", "PKSampler",
           "collate_features", "collate_waveforms"]
