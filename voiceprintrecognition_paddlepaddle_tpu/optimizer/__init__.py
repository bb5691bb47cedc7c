"""Optimizer + LR-scheduler factories on optax.

Equivalent of reference ``ppvector/optimizer/__init__.py:13-33`` (which
reflects over ``paddle.optimizer``): the same config keys select the
optimizer/scheduler. ``weight_decay`` reproduces paddle's *coupled* L2
regularisation (decay added to the gradients before the moment updates),
not AdamW-style decoupled decay — unless AdamW is requested explicitly.
Auto-fills ``fix_epoch`` / ``step_per_epoch`` / ``T_max`` like the
reference (``optimizer/__init__.py:24-29``).
"""

import optax

from ..utils.logger import logger
from .scheduler import (CosineAnnealingDecay, MarginScheduler,
                        WarmupCosineSchedulerLR, cosine_decay_with_warmup)

__all__ = ["build_optimizer", "build_lr_scheduler", "MarginScheduler",
           "WarmupCosineSchedulerLR"]

SCHEDULERS = {
    "WarmupCosineSchedulerLR": WarmupCosineSchedulerLR,
    "CosineAnnealingDecay": CosineAnnealingDecay,
}


def build_lr_scheduler(step_per_epoch, configs):
    """Returns schedule(step) -> lr."""
    use_scheduler = configs.optimizer_conf.get("scheduler",
                                               "WarmupCosineSchedulerLR")
    scheduler_args = dict(configs.optimizer_conf.get("scheduler_args", {}))
    if use_scheduler == "CosineAnnealingDecay" and "T_max" not in scheduler_args:
        scheduler_args["T_max"] = int(
            configs.train_conf.max_epoch * 1.2) * step_per_epoch
    if use_scheduler == "WarmupCosineSchedulerLR":
        scheduler_args.setdefault("fix_epoch", configs.train_conf.max_epoch)
        scheduler_args.setdefault("step_per_epoch", step_per_epoch)
    if use_scheduler not in SCHEDULERS:
        raise ValueError(f"unknown scheduler: {use_scheduler}")
    schedule = SCHEDULERS[use_scheduler](**scheduler_args)
    logger.info(f"created LR schedule: {use_scheduler}, args: {scheduler_args}")
    return schedule


def build_optimizer(learning_rate, configs):
    """Returns an optax GradientTransformation; ``learning_rate`` may be a
    float or a schedule(step)->lr."""
    use_optimizer = configs.optimizer_conf.get("optimizer", "Adam")
    args = dict(configs.optimizer_conf.get("optimizer_args", {}))
    weight_decay = float(args.pop("weight_decay", 0.0))
    b1 = float(args.pop("beta1", 0.9))
    b2 = float(args.pop("beta2", 0.999))
    eps = float(args.pop("epsilon", 1e-8))
    momentum = float(args.pop("momentum", 0.9))
    # bf16 first moment halves the Adam-m HBM traffic on the
    # bandwidth-bound train step; the variance stays f32 (its magnitude
    # range is what bf16 cannot represent well). Opt-in via
    # optimizer_args.mu_dtype: bfloat16
    mu_dtype = args.pop("mu_dtype", None)

    chain = []
    if use_optimizer == "Adam":
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))  # coupled L2
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps,
                                         mu_dtype=mu_dtype))
    elif use_optimizer == "AdamMax":
        # infinity-norm second moment (paddle.optimizer.Adamax parity) —
        # NOT plain Adam
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))  # coupled L2
        chain.append(optax.scale_by_adamax(b1=b1, b2=b2, eps=eps))
    elif use_optimizer == "AdamW":
        chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps,
                                         mu_dtype=mu_dtype))
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))  # decoupled
    elif use_optimizer == "Momentum":
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.trace(decay=momentum, nesterov=False))
    elif use_optimizer == "SGD":
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
    else:
        raise ValueError(f"unknown optimizer: {use_optimizer}")
    chain.append(optax.scale_by_learning_rate(learning_rate))
    if args:
        # a typo'd key (e.g. beta_1, weight_dacay) would otherwise train
        # silently with defaults
        logger.warning(f"unrecognised optimizer_args ignored: "
                       f"{sorted(args)}")
    logger.info(f"created optimizer: {use_optimizer}, "
                f"weight_decay: {weight_decay}")
    return optax.chain(*chain)
