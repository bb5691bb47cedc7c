"""Every shipped YAML config builds its model, loss, optimizer and LR
schedule, and the model produces a 192-d embedding (shape-checked)."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest
import yaml

from voiceprintrecognition_paddlepaddle_tpu.loss import build_loss
from voiceprintrecognition_paddlepaddle_tpu.models import build_model
from voiceprintrecognition_paddlepaddle_tpu.optimizer import (
    build_lr_scheduler, build_optimizer)
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import dict_to_object

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.yml")))
MODEL_CONFIGS = [c for c in CONFIGS if "augmentation" not in c]


def test_found_all_reference_configs():
    names = {os.path.basename(c) for c in CONFIGS}
    assert names == {"augmentation.yml", "cam++.yml", "ecapa_tdnn.yml",
                     "eres2net.yml", "eres2netv2.yml", "res2net.yml",
                     "resnet_se.yml", "tdnn.yml"}


@pytest.mark.parametrize("path", MODEL_CONFIGS,
                         ids=[os.path.basename(c) for c in MODEL_CONFIGS])
def test_config_builds(path):
    with open(path, encoding="utf-8") as f:
        configs = dict_to_object(yaml.safe_load(f))
    feature_dim = configs.preprocess_conf.method_args.get("n_mels", 80)
    model = build_model(input_size=feature_dim, configs=configs)
    x = jnp.zeros((2, 98, feature_dim), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, train=False))
    out = jax.eval_shape(lambda v: model.apply(v, x, train=False), shapes)
    assert out.shape == (2, configs.model_conf.model_args.embd_dim)

    loss = build_loss(configs)
    assert callable(loss)
    sched = build_lr_scheduler(step_per_epoch=100, configs=configs)
    assert float(sched(1000)) > 0
    tx = build_optimizer(sched, configs)
    assert hasattr(tx, "update")


def test_augmentation_config_keys():
    with open(os.path.join(REPO, "configs", "augmentation.yml"),
              encoding="utf-8") as f:
        aug = yaml.safe_load(f)
    assert set(aug) == {"speed", "volume", "noise", "reverb", "spec_aug"}
    assert aug["speed"]["prob"] == 1.0
    assert "max_time_warp" in aug["spec_aug"]
