"""Checkpoint utils: layout, pruning, best-model, shape-filtered
pretrained loading."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from voiceprintrecognition_paddlepaddle_tpu.trainer import TrainState
from voiceprintrecognition_paddlepaddle_tpu.utils.checkpoint import (
    load_checkpoint, load_pretrained, save_checkpoint, save_msgpack)
from voiceprintrecognition_paddlepaddle_tpu.utils.utils import dict_to_object

CFG = dict_to_object({
    "model_conf": {"model": "TDNN"},
    "preprocess_conf": {"feature_method": "Fbank"},
    "loss_conf": {"loss": "AAMLoss"},
})


def _state(val=1.0):
    return TrainState(
        params={"backbone": {"w": jnp.full((3, 3), val)}},
        batch_stats={"backbone": {"mean": jnp.zeros((3,))}},
        loss_params={},
        opt_state={"m": jnp.zeros((3, 3))},
        step=jnp.asarray(7, jnp.int32))


def test_save_resume_roundtrip(tmp_path):
    save = str(tmp_path)
    save_checkpoint(CFG, _state(2.5), save, epoch_id=4, eer=0.11,
                    min_dcf=0.5, threshold=0.3, margin=0.2)
    d = os.path.join(save, "TDNN_Fbank")
    assert os.path.isdir(os.path.join(d, "epoch_4"))
    assert os.path.isdir(os.path.join(d, "last_model"))
    with open(os.path.join(d, "epoch_4", "model.state")) as f:
        meta = json.load(f)
    assert meta["last_epoch"] == 4 and meta["eer"] == 0.11
    assert meta["loss"] == "AAMLoss" and meta["margin"] == 0.2

    state, last_epoch, best_eer = load_checkpoint(CFG, _state(0.0), save)
    assert last_epoch == 4 and best_eer == 0.11
    assert float(state.params["backbone"]["w"][0, 0]) == 2.5
    assert int(state.step) == 7


def test_mid_epoch_save_replays_partial_epoch(tmp_path):
    """Mid-epoch (10000-batch) saves record completed_epoch = epoch-1 so
    a crash-resume replays the interrupted epoch instead of skipping its
    remaining batches."""
    save = str(tmp_path)
    save_checkpoint(CFG, _state(1.0), save, epoch_id=3, margin=0.1,
                    completed_epoch=2)
    _, last_epoch, _ = load_checkpoint(CFG, _state(0.0), save)
    assert last_epoch == 2  # resume re-enters epoch 3
    with open(os.path.join(save, "TDNN_Fbank", "epoch_3",
                           "model.state")) as f:
        assert json.load(f)["last_epoch"] == 2


def test_resume_restores_best_eer_not_last(tmp_path):
    """best_eer after resume must be the best seen (from best_model), and a
    perfect EER of 0.0 must not be discarded as falsy."""
    save = str(tmp_path)
    save_checkpoint(CFG, _state(), save, epoch_id=3, eer=0.05,
                    min_dcf=0.3, threshold=0.2, best_model=True)
    save_checkpoint(CFG, _state(), save, epoch_id=4, eer=0.12,
                    min_dcf=0.5, threshold=0.3)  # worse last epoch
    _, last_epoch, best_eer = load_checkpoint(CFG, _state(0.0), save)
    assert last_epoch == 4 and best_eer == 0.05

    save2 = str(tmp_path / "zero")
    save_checkpoint(CFG, _state(), save2, epoch_id=1, eer=0.0,
                    min_dcf=0.0, threshold=0.5)
    _, _, best_eer = load_checkpoint(CFG, _state(0.0), save2)
    assert best_eer == 0.0


def test_epoch_pruning(tmp_path):
    save = str(tmp_path)
    for e in range(1, 6):
        save_checkpoint(CFG, _state(), save, epoch_id=e)
    d = os.path.join(save, "TDNN_Fbank")
    eps = sorted(x for x in os.listdir(d) if x.startswith("epoch_"))
    # epoch_{n-3} pruned each save: only the last 3 remain
    assert eps == ["epoch_3", "epoch_4", "epoch_5"]


def test_best_model_not_pruned_and_no_last_copy(tmp_path):
    save = str(tmp_path)
    save_checkpoint(CFG, _state(), save, epoch_id=1, eer=0.2,
                    best_model=True)
    d = os.path.join(save, "TDNN_Fbank")
    assert os.path.isdir(os.path.join(d, "best_model"))
    assert not os.path.exists(os.path.join(d, "last_model"))


def test_load_pretrained_shape_filtering(tmp_path):
    good = {"params": {"backbone": {"w": np.ones((3, 3), np.float32),
                                    "extra": np.ones((2,), np.float32)}},
            "batch_stats": {}, "loss_params": {}}
    path = os.path.join(str(tmp_path), "model.msgpack")
    save_msgpack(good, path)
    target = {"params": {"backbone": {"w": np.zeros((3, 3), np.float32),
                                      "v": np.zeros((4,), np.float32)}},
              "batch_stats": {}, "loss_params": {}}
    merged = load_pretrained(target, str(tmp_path))
    assert (merged["params"]["backbone"]["w"] == 1).all()   # loaded
    assert (merged["params"]["backbone"]["v"] == 0).all()   # missing: kept


def test_load_pretrained_shape_mismatch_skipped(tmp_path):
    ckpt = {"params": {"backbone": {"w": np.ones((5, 5), np.float32)}},
            "batch_stats": {}, "loss_params": {}}
    path = os.path.join(str(tmp_path), "model.msgpack")
    save_msgpack(ckpt, path)
    target = {"params": {"backbone": {"w": np.zeros((3, 3), np.float32)}},
              "batch_stats": {}, "loss_params": {}}
    merged = load_pretrained(target, str(tmp_path))
    assert (merged["params"]["backbone"]["w"] == 0).all()  # skipped


def test_resume_missing_dir_is_noop(tmp_path):
    state, last_epoch, best = load_checkpoint(CFG, _state(3.0),
                                              str(tmp_path))
    assert last_epoch == 0 and best == 1.0
    assert float(state.params["backbone"]["w"][0, 0]) == 3.0


def test_explicit_resume_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_checkpoint(CFG, _state(), str(tmp_path),
                        resume_model=str(tmp_path / "nope"))


def test_async_saver_orders_and_surfaces_errors(tmp_path):
    from voiceprintrecognition_paddlepaddle_tpu.utils.checkpoint import \
        AsyncSaver

    s = AsyncSaver()
    order = []
    for i in range(5):
        s.submit(lambda i=i: order.append(i))
    s.wait()
    assert order == [0, 1, 2, 3, 4]

    def boom():
        raise OSError("disk full")

    s.submit(boom)
    import pytest
    with pytest.raises(RuntimeError, match="disk full"):
        s.wait()
    # saver stays usable after the error is reported
    s.submit(lambda: order.append(5))
    s.close()
    assert order[-1] == 5


def test_orbax_roundtrip(tmp_path):
    """checkpoint_format: orbax writes Orbax directories instead of
    msgpack files; auto-resume detects them transparently."""
    save = str(tmp_path)
    save_checkpoint(CFG, _state(3.25), save, epoch_id=2, eer=0.2,
                    min_dcf=0.4, threshold=0.1, fmt="orbax")
    d = os.path.join(save, "TDNN_Fbank", "epoch_2")
    assert os.path.isdir(os.path.join(d, "model.orbax"))
    assert os.path.isdir(os.path.join(d, "optimizer.orbax"))
    assert not os.path.exists(os.path.join(d, "model.msgpack"))

    state, last_epoch, best_eer = load_checkpoint(CFG, _state(0.0), save)
    assert last_epoch == 2 and best_eer == 0.2
    assert float(state.params["backbone"]["w"][0, 0]) == 3.25
    assert int(state.step) == 7


def test_orbax_sharded_state_roundtrip(tmp_path):
    """Round-2 gap: sharded checkpointing for large multi-host runs. A
    pytree of jax.Arrays holding BOTH a replicated and a batch-sharded
    array over the 8-device mesh survives an Orbax save/restore with
    values AND shardings intact (StandardCheckpointer records per-shard
    layout; restore targets reimpose the shardings)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from voiceprintrecognition_paddlepaddle_tpu.utils.checkpoint import (
        load_orbax, save_orbax)

    devs = np.array(jax.devices())
    mesh = Mesh(devs, ("dp",))
    repl = NamedSharding(mesh, P())
    shrd = NamedSharding(mesh, P("dp"))
    tree = {
        "params": jax.device_put(
            jnp.arange(128, dtype=jnp.float32).reshape(8, 16), repl),
        "moments": jax.device_put(
            jnp.arange(256, dtype=jnp.float32).reshape(16, 16), shrd),
    }
    path = os.path.join(str(tmp_path), "sharded.orbax")
    save_orbax(tree, path)

    target = {
        "params": jax.device_put(jnp.zeros((8, 16), jnp.float32), repl),
        "moments": jax.device_put(jnp.zeros((16, 16), jnp.float32), shrd),
    }
    got = load_orbax(target, path)
    np.testing.assert_array_equal(np.asarray(got["params"]),
                                  np.asarray(tree["params"]))
    np.testing.assert_array_equal(np.asarray(got["moments"]),
                                  np.asarray(tree["moments"]))
    assert got["moments"].sharding.is_equivalent_to(shrd, 2)
    assert got["params"].sharding.is_equivalent_to(repl, 2)
