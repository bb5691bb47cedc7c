"""Checkpoint save / resume / pretrained-load.

Directory/JSON-state semantics of reference ``ppvector/utils/checkpoint.py``:
``models/<Model>_<Feature>/{epoch_N, last_model, best_model}``, a
``model.state`` JSON ({last_epoch, version, model, feature_method, loss,
eer/min_dcf/threshold, margin}), ``epoch_{N-3}`` pruning, best-model copy
on EER improvement, and shape-filtered partial loading of pretrained
weights with warnings.

Serialization is flax msgpack of the full train state. Unlike the
reference — which replays ``scheduler.step()`` epoch×steps times on resume
— the step counter is part of the state and the closed-form schedules need
no replay.
"""

import json
import os
import queue
import shutil
import threading

import jax
import numpy as np
from flax import serialization
from flax.core import freeze, unfreeze

from .. import __version__
from .logger import logger

__all__ = ["save_checkpoint", "load_checkpoint", "load_pretrained",
           "save_msgpack", "load_msgpack", "save_orbax", "load_orbax",
           "AsyncSaver"]


class AsyncSaver:
    """Ordered background writer for checkpoints.

    The device→host snapshot must happen on the caller's thread (the train
    step donates its input buffers, so arrays referenced after the next
    step dispatch would be invalid); serialization, disk writes, the
    ``last_model`` copy and epoch pruning — the actually slow parts — run
    here on a single worker thread, preserving submission order. Errors
    surface on the next submit/wait rather than being swallowed.
    """

    def __init__(self):
        # bounded: each queued closure holds a full host copy of
        # model+optimizer state; a slow disk must backpressure the trainer
        # rather than accumulate snapshots in RAM
        self._q = queue.Queue(maxsize=2)
        self._err = None
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while True:
            fn = self._q.get()
            if fn is None:
                self._q.task_done()
                return
            try:
                fn()
            except Exception as e:  # noqa: BLE001 - also raised on next call
                logger.error(f"async checkpoint write failed: {e!r}")
                self._err = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError(f"async checkpoint write failed: {err}") \
                from err

    def submit(self, fn):
        self._check()
        self._q.put(fn)

    def wait(self):
        """Block until all submitted writes are on disk."""
        self._q.join()
        self._check()

    def close(self):
        self._q.put(None)
        self._q.join()
        self._check()


def _ckpt_dir(configs, save_model_path, tag):
    name = (f"{configs.model_conf.model}_"
            f"{configs.preprocess_conf.feature_method}")
    return os.path.join(save_model_path, name, tag)


def save_msgpack(tree, path):
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def load_msgpack(target, path):
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


# ---------------------------------------------------------------------------
# Orbax backend: sharded/atomic checkpointing for large (multi-host) runs
# ---------------------------------------------------------------------------
def save_orbax(tree, path):
    """Atomic Orbax save of a pytree directory. For multi-host SHARDED
    states every process must call this (Orbax writes per-host shards);
    with replicated params (this framework's DP) a rank-0 call suffices,
    matching the msgpack path's gating. Opt in with
    ``train_conf.checkpoint_format: orbax`` (msgpack stays the default —
    single-file, grep-able, no directory protocol)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    shutil.rmtree(path, ignore_errors=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree)


def load_orbax(target, path):
    """Restore an Orbax directory against ``target``'s structure (and
    shardings, when the target holds jax.Arrays)."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), target=target)


def _save_tree(tree, dirpath, name, fmt):
    if fmt == "orbax":
        save_orbax(tree, os.path.join(dirpath, name + ".orbax"))
    else:
        save_msgpack(tree, os.path.join(dirpath, name + ".msgpack"))


def _load_tree(target, dirpath, name):
    orbax_path = os.path.join(dirpath, name + ".orbax")
    if os.path.isdir(orbax_path):
        return load_orbax(target, orbax_path)
    return load_msgpack(target, os.path.join(dirpath, name + ".msgpack"))


def save_checkpoint(configs, state, save_model_path, epoch_id, eer=None,
                    min_dcf=None, threshold=None, margin=None,
                    best_model=False, async_saver=None, fmt=None,
                    completed_epoch=None):
    """``state`` is the trainer's TrainState pytree.

    With ``async_saver`` (an :class:`AsyncSaver`), the device→host snapshot
    happens here (cheap, and required before the donated buffers are
    reused) while serialization + disk IO run in the background.

    ``completed_epoch`` overrides the ``last_epoch`` recorded in
    ``model.state`` — mid-epoch saves pass ``epoch_id - 1`` so an
    auto-resume REPLAYS the interrupted epoch instead of silently
    skipping its remaining batches."""
    tag = "best_model" if best_model else f"epoch_{epoch_id}"
    model_path = _ckpt_dir(configs, save_model_path, tag)
    if fmt is None:
        fmt = configs.get("train_conf", {}).get("checkpoint_format",
                                                "msgpack")

    model_tree = jax.device_get(
        {"params": state.params, "batch_stats": state.batch_stats,
         "loss_params": state.loss_params})
    opt_tree = jax.device_get({"opt_state": state.opt_state,
                               "step": state.step})

    data = {"last_epoch": int(epoch_id if completed_epoch is None
                              else completed_epoch),
            "version": __version__,
            "model": configs.model_conf.model,
            "feature_method": configs.preprocess_conf.feature_method,
            "loss": configs.loss_conf.get(
                "loss", configs.loss_conf.get("use_loss", "AAMLoss"))}
    if eer is not None:
        data.update(threshold=threshold, eer=eer, min_dcf=min_dcf)
    if margin is not None:
        data["margin"] = float(margin)

    def _write():
        if os.path.exists(model_path):
            shutil.rmtree(model_path)
        os.makedirs(model_path, exist_ok=True)
        _save_tree(model_tree, model_path, "model", fmt)
        _save_tree(opt_tree, model_path, "optimizer", fmt)
        with open(os.path.join(model_path, "model.state"), "w",
                  encoding="utf-8") as f:
            json.dump(data, f, indent=4, ensure_ascii=False)
        if not best_model:
            last_path = _ckpt_dir(configs, save_model_path, "last_model")
            shutil.rmtree(last_path, ignore_errors=True)
            shutil.copytree(model_path, last_path)
            old = _ckpt_dir(configs, save_model_path,
                            f"epoch_{epoch_id - 3}")
            if os.path.exists(old):
                shutil.rmtree(old)
        logger.info(f"checkpoint saved: {model_path}")

    if async_saver is not None:
        async_saver.submit(_write)
    else:
        _write()
    return model_path


def load_checkpoint(configs, state, save_model_path, resume_model=None):
    """Auto-resume from ``last_model`` (or an explicit path). Returns
    (state, last_epoch, best_eer)."""
    last_epoch, best_eer = 0, 1.0
    model_path = resume_model or _ckpt_dir(configs, save_model_path,
                                           "last_model")
    def _has(name):
        return (os.path.exists(os.path.join(model_path, name + ".msgpack"))
                or os.path.isdir(os.path.join(model_path, name + ".orbax")))

    if not (_has("model") and _has("optimizer")):
        if resume_model is not None:
            raise FileNotFoundError(f"checkpoint not found: {model_path}")
        return state, last_epoch, best_eer
    try:
        model_tree = _load_tree(
            {"params": state.params, "batch_stats": state.batch_stats,
             "loss_params": state.loss_params}, model_path, "model")
        opt_tree = _load_tree(
            {"opt_state": state.opt_state, "step": state.step}, model_path,
            "optimizer")
        state = state.replace(params=model_tree["params"],
                              batch_stats=model_tree["batch_stats"],
                              loss_params=model_tree["loss_params"],
                              opt_state=opt_tree["opt_state"],
                              step=int(opt_tree["step"]))
        state_file = os.path.join(model_path, "model.state")
        if os.path.exists(state_file):
            with open(state_file, "r", encoding="utf-8") as f:
                j = json.load(f)
            last_epoch = j.get("last_epoch", 0)
            if j.get("eer") is not None:  # 0.0 is a valid (perfect) EER
                best_eer = j["eer"]
        # best-model tracking must restore the *best* EER seen, not the
        # last epoch's: prefer the sibling best_model's recorded state
        best_state = os.path.join(os.path.dirname(os.path.normpath(model_path)),
                                  "best_model", "model.state")
        if os.path.exists(best_state):
            with open(best_state, "r", encoding="utf-8") as f:
                bj = json.load(f)
            if bj.get("eer") is not None:
                best_eer = min(best_eer, bj["eer"])
        logger.info(f"resumed model + optimizer state: {model_path}")
    except Exception as e:
        if resume_model is not None:
            raise
        logger.warning(f"auto-resume from latest model failed: {e}")
    return state, last_epoch, best_eer


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def load_pretrained(variables, pretrained_model):
    """Shape-filtered partial load (reference ``checkpoint.py``
    load_pretrained): keys missing or shape-mismatched are skipped with a
    warning; returns the merged variables dict."""
    if pretrained_model is None:
        return variables
    if os.path.isdir(pretrained_model):
        pretrained_model = os.path.join(pretrained_model, "model.msgpack")
    assert os.path.exists(pretrained_model), \
        f"{pretrained_model} does not exist!"
    with open(pretrained_model, "rb") as f:
        loaded = serialization.msgpack_restore(f.read())

    variables = unfreeze(variables)
    flat_model = _flatten(variables)
    flat_loaded = _flatten(loaded)
    # the checkpoint nests {params, batch_stats, loss_params}; the target
    # may be the same nesting or a bare collection dict — align by suffix
    merged = 0
    for key, value in flat_model.items():
        candidates = [k for k in flat_loaded
                      if k == key or k[-len(key):] == key]
        if not candidates:
            logger.warning(f"Lack weight: {'/'.join(key)}")
            continue
        lv = flat_loaded[candidates[0]]
        if tuple(np.shape(lv)) != tuple(np.shape(value)):
            logger.warning(
                f"{'/'.join(key)} not used, shape {list(np.shape(lv))} "
                f"unmatched with {list(np.shape(value))} in model.")
            continue
        node = variables
        for k in key[:-1]:
            node = node[k]
        node[key[-1]] = np.asarray(lv, dtype=np.asarray(value).dtype)
        merged += 1
    logger.info(f"loaded pretrained model ({merged} tensors): "
                f"{pretrained_model}")
    return variables
