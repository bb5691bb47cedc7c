"""TPU-native speaker-verification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
yeyupiaoling/VoiceprintRecognition-PaddlePaddle (``ppvector`` v1.1.1,
see reference ``ppvector/__init__.py:1``): audio front-end, six
speaker-embedding backbones, margin-softmax training, EER/MinDCF
evaluation, and the contrast / recognition / diarization inference
surface — designed TPU-first (device meshes, static shapes, MXU-friendly
feature extraction) rather than translated from the reference.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
    # honour an explicit JAX_PLATFORMS=cpu even when a TPU plugin (axon)
    # is installed — the plugin wins over the env var; the config update
    # is authoritative. Needed for CPU-simulated multi-device testing.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def __getattr__(name):
    # lazy top-level conveniences: keep package import light
    if name == "Trainer":
        from .trainer import Trainer
        return Trainer
    if name == "Predictor":
        from .predict import Predictor
        return Predictor
    raise AttributeError(name)
