"""Module-path parity shim: the reference exposes the featurizer as
``ppvector.data_utils.featurizer.AudioFeaturizer``; the implementation
lives on the device path in ``ops.features``."""

from ..ops.features import AudioFeaturizer

__all__ = ["AudioFeaturizer"]
