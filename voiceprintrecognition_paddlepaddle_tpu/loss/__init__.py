"""Training objectives + factory.

Registry equivalent of reference ``ppvector/loss/__init__.py:16-22``.
All losses are pure jittable callables taking the model output dict and
integer labels; the scheduled margin is passed as a *traced* argument so
the margin scheduler never triggers recompilation (the reference mutates
loss-object state per step instead — ``optimizer/scheduler.py:44-102``).
"""

from ..utils.logger import logger
from .losses import (AAMLoss, AMLoss, ARMLoss, CELoss, SphereFace2,
                     SubCenterLoss, TripletAngularMarginLoss)

__all__ = ["build_loss", "LOSSES", "AAMLoss", "AMLoss", "ARMLoss", "CELoss",
           "SphereFace2", "SubCenterLoss", "TripletAngularMarginLoss"]

LOSSES = {
    "AAMLoss": AAMLoss,
    "AMLoss": AMLoss,
    "ARMLoss": ARMLoss,
    "CELoss": CELoss,
    "SphereFace2": SphereFace2,
    "SubCenterLoss": SubCenterLoss,
    "TripletAngularMarginLoss": TripletAngularMarginLoss,
}


def build_loss(configs):
    use_loss = configs.loss_conf.get("loss", "AAMLoss")
    loss_args = dict(configs.loss_conf.get("loss_args", {}))
    if use_loss not in LOSSES:
        raise ValueError(f"unknown loss: {use_loss}")
    loss = LOSSES[use_loss](**loss_args)
    logger.info(f"created loss: {use_loss}, args: {loss_args}")
    return loss
