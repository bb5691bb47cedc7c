"""Model zoo + factory.

Registry-based equivalent of reference ``ppvector/models/__init__.py:15-21``
(which reflects on class names); the same config ``model_conf.model`` /
``model_conf.model_args`` keys select and parametrise a backbone.
"""

from ..utils.logger import logger
from .campplus import CAMPPlus
from .ecapa_tdnn import EcapaTdnn
from .eres2net import ERes2Net, ERes2NetV2
from .fc import SpeakerIdentification
from .res2net import Res2Net
from .resnet_se import ResNetSE
from .tdnn import TDNN

__all__ = ["build_model", "MODELS", "SpeakerIdentification", "CAMPPlus",
           "EcapaTdnn", "ERes2Net", "ERes2NetV2", "Res2Net", "ResNetSE", "TDNN"]

MODELS = {
    "CAMPPlus": CAMPPlus,
    "EcapaTdnn": EcapaTdnn,
    "ERes2Net": ERes2Net,
    "ERes2NetV2": ERes2NetV2,
    "Res2Net": Res2Net,
    "ResNetSE": ResNetSE,
    "TDNN": TDNN,
}


def build_model(input_size, configs, dtype=None):
    """Instantiate the backbone named by ``configs.model_conf.model``."""
    use_model = configs.model_conf.get("model", "CAMPPlus")
    model_args = dict(configs.model_conf.get("model_args", {}))
    if use_model not in MODELS:
        raise ValueError(f"unknown model: {use_model}")
    # YAML lists arrive as python lists; flax dataclass fields want tuples
    for k, v in model_args.items():
        if isinstance(v, list):
            model_args[k] = tuple(v)
    model = MODELS[use_model](input_size=input_size, dtype=dtype, **model_args)
    logger.info(f"created model: {use_model}, args: {model_args}")
    return model
