"""Training / evaluation orchestrator.

API parity with reference ``ppvector/trainer.py:33-474``
(``PPVectorTrainer``: train / evaluate / extract_features / export, YAML
configs, augmentation configs, auto-resume, best-model tracking,
TensorBoard scalars, rank-0 gating) — built TPU-first:

- one jitted, donated train step fuses device-side augmentation, feature
  extraction (MXU matmul Fbank), the backbone+classifier forward, the
  margin loss, and the optimizer update; the reference spreads this over
  CPU workers + many small GPU launches (``trainer.py:202-274``);
- data parallelism is a 1-D ``Mesh`` + ``NamedSharding`` (params
  replicated, batch sharded) instead of Fleet/NCCL wrappers
  (``trainer.py:299-320``); BatchNorm statistics become *global-batch*
  under jit (an improvement over the reference's per-replica BN);
- LR and margin schedules are closed-form functions of the step counter,
  so resume never replays scheduler steps (``checkpoint.py`` in reference);
- eval scoring is one on-chip matmul over normalized embeddings instead of
  a per-trial sklearn loop (``trainer.py:416-423``).
"""

import os
import time
from datetime import timedelta
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml
from flax import struct

from .data_utils import (DataLoader, SpeakerDataset, collate_features,
                         collate_waveforms)
from .data_utils.pk_sampler import BatchSampler, PKSampler
from .loss import build_loss
from .metric.metrics import compute_dcf, compute_eer, compute_fnr_fpr
from .models import build_model
from .models.fc import SpeakerIdentification
from .ops.augment import DeviceAugmenter
from .ops.features import AudioFeaturizer
from .optimizer import MarginScheduler, build_lr_scheduler, build_optimizer
from .parallel import (allgather_ragged, batch_sharding, create_mesh,
                       local_process_info, replicated_sharding, shard_batch)
from .utils.checkpoint import (AsyncSaver, load_checkpoint,
                               load_pretrained, save_checkpoint,
                               save_msgpack)
from .utils.logger import logger
from .utils.utils import dict_to_object, print_arguments, select_platform

__all__ = ["Trainer", "TrainState", "PPVectorTrainer"]


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    loss_params: Any
    opt_state: Any
    step: Any


def _count_params(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(tree))


class Trainer:
    """``Trainer(configs, use_gpu=True, data_augment_configs=None)`` —
    constructor signature kept from the reference (``use_gpu`` maps to
    "use the accelerator"; with no TPU visible JAX falls back to CPU)."""

    def __init__(self, configs, use_gpu=True, data_augment_configs=None):
        select_platform(use_gpu)
        # multi-host bootstrap (no-op unless VPR_COORDINATOR /
        # VPR_AUTO_DISTRIBUTED is set); must precede first backend use
        from .parallel import maybe_initialize_distributed
        maybe_initialize_distributed()
        if isinstance(configs, str):
            with open(configs, "r", encoding="utf-8") as f:
                configs = yaml.load(f.read(), Loader=yaml.FullLoader)
            print_arguments(configs=configs)
        self.configs = dict_to_object(configs)
        if isinstance(data_augment_configs, str):
            if not data_augment_configs.strip():
                data_augment_configs = None  # '' on the CLI = no augmentation
            else:
                with open(data_augment_configs, "r", encoding="utf-8") as f:
                    data_augment_configs = yaml.load(f.read(),
                                                     Loader=yaml.FullLoader)
                print_arguments(configs=data_augment_configs,
                                title="augmentation configs")
        self.data_augment_configs = dict_to_object(data_augment_configs or {})
        self.use_gpu = use_gpu

        self.audio_featurizer = None
        self.train_dataset = self.train_loader = None
        self.enroll_dataset = self.enroll_loader = None
        self.trials_dataset = self.trials_loader = None
        self.model = self.classifier = None
        self.state = None
        self.criterion = None
        self.margin_scheduler = None
        self.lr_schedule = None
        self.optimizer = None
        self.accum_steps = 1
        self.augmenter = None
        self.mesh = None
        self.amp_dtype = (jnp.bfloat16
                          if self.configs.train_conf.get("enable_amp", False)
                          else None)

        self.max_step = self.train_step_num = 0
        self.train_loss = self.train_acc = None
        self.train_eta_sec = None
        self.train_window_speeds = []
        self.eval_eer = self.eval_min_dcf = self.eval_threshold = None
        self.test_log_step = self.train_log_step = 0
        self.stop_train = self.stop_eval = False

        self._jit_train_step = None
        self._jit_embed = None
        self._fast_eval_fn = None

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def _loss_name(self):
        return self.configs.loss_conf.get(
            "loss", self.configs.loss_conf.get("use_loss", "AAMLoss"))

    def __setup_dataloader(self, is_train=False):
        self.audio_featurizer = AudioFeaturizer(
            feature_method=self.configs.preprocess_conf.feature_method,
            method_args=self.configs.preprocess_conf.get("method_args", {}))
        dataset_args = dict(self.configs.dataset_conf.get("dataset", {}))
        sampler_args = dict(self.configs.dataset_conf.get("sampler", {}))
        loader_args = dict(self.configs.dataset_conf.get("dataLoader", {}))
        rank, world = local_process_info()

        max_feature_len = self.audio_featurizer.num_frames(
            int(dataset_args.get("max_duration", 3)
                * dataset_args.get("sample_rate", 16000)))

        if is_train:
            self.train_dataset = SpeakerDataset(
                data_list_path=self.configs.dataset_conf.train_list,
                aug_conf=self.data_augment_configs,
                num_speakers=self.configs.model_conf.classifier.num_speakers,
                mode="train", max_feature_len=max_feature_len,
                **dataset_args)
            use_pk = (self.configs.dataset_conf.get("is_use_pksampler", False)
                      or self._loss_name() == "TripletAngularMarginLoss")
            if use_pk:
                sampler = PKSampler(
                    self.train_dataset,
                    sample_per_id=self.configs.dataset_conf.get(
                        "sample_per_id", 4),
                    num_replicas=world, rank=rank, **sampler_args)
            else:
                sampler = BatchSampler(self.train_dataset,
                                       num_replicas=world, rank=rank,
                                       **sampler_args)
            self.train_loader = DataLoader(
                self.train_dataset, sampler, self._train_collate,
                num_workers=loader_args.get("num_workers", 4))

        # eval loaders (reference ``trainer.py:113-131``)
        eval_args = dict(dataset_args)
        eval_args["max_duration"] = \
            self.configs.dataset_conf.eval_conf.max_duration
        eval_bs = self.configs.dataset_conf.eval_conf.batch_size
        for attr, list_key in (("enroll", "enroll_list"),
                               ("trials", "trials_list")):
            list_path = self.configs.dataset_conf.get(list_key)
            if not list_path or not os.path.exists(list_path):
                continue
            ds = SpeakerDataset(data_list_path=list_path, mode="eval",
                                **eval_args)
            # multi-process: each process embeds its own shard of the
            # list; embeddings are allgathered in _embed_loader
            sampler = BatchSampler(ds, batch_size=eval_bs, shuffle=False,
                                   drop_last=False, num_replicas=world,
                                   rank=rank)
            loader = DataLoader(ds, sampler, self._eval_collate,
                                num_workers=loader_args.get("num_workers", 4))
            setattr(self, f"{attr}_dataset", ds)
            setattr(self, f"{attr}_loader", loader)

    def _train_collate(self, items):
        if items[0][0].ndim == 2:  # precomputed features
            return ("features",) + collate_features(items, bucket=True)
        # int16 transfer: half the host->device bytes, converted on device
        return ("waveforms",) + collate_waveforms(items, bucket=False,
                                                  quantize_int16=True)

    def _eval_collate(self, items):
        if items[0][0].ndim == 2:
            return ("features",) + collate_features(items, bucket=True)
        return ("waveforms",) + collate_waveforms(items, bucket=True)

    def __setup_model(self, input_size, is_train=False):
        # batch axis must divide evenly over the mesh; use the largest
        # device count that divides the global train batch.
        # train_conf.num_devices caps the mesh (default: all devices)
        n_dev = min(jax.device_count(),
                    int(self.configs.train_conf.get("num_devices", 0))
                    or jax.device_count())
        if is_train and jax.process_count() == 1:
            bs = int(self.configs.dataset_conf.sampler.batch_size)
            while bs % n_dev:
                n_dev -= 1
            if n_dev != jax.device_count():
                logger.warning(
                    f"batch_size {bs} not divisible by "
                    f"{jax.device_count()} devices; using a {n_dev}-device "
                    f"data-parallel mesh")
        elif is_train:
            # multi-host: the global batch is per-process bs x process
            # count over ALL devices, so the requirement is local — the
            # per-process batch must divide over this host's devices
            bs = int(self.configs.dataset_conf.sampler.batch_size)
            local = jax.local_device_count()
            if bs % local:
                raise ValueError(
                    f"per-process batch_size {bs} is not divisible by the "
                    f"{local} local devices; shard_batch cannot lay the "
                    f"global batch out evenly — use a multiple of {local}")
        if n_dev != jax.device_count() and jax.process_count() > 1:
            # slicing the global device list would exclude whole hosts,
            # leaving their processes with no addressable device in the
            # mesh; multi-host runs must use every device (pad the batch
            # or set a divisible batch_size instead)
            logger.warning(
                "ignoring num_devices/batch mesh cap in a multi-host run; "
                "using all devices")
            n_dev = jax.device_count()
        self.mesh = create_mesh(jax.devices()[:n_dev])
        self.model = build_model(input_size=input_size, configs=self.configs,
                                 dtype=self.amp_dtype)
        num_class = self.configs.model_conf.classifier.num_speakers
        if is_train:
            speed_conf = self.data_augment_configs.get("speed") or {}
            if (speed_conf.get("prob", 0) > 0
                    and speed_conf.get("speed_perturb_3_class", False)):
                num_class *= 3
            cls_conf = dict(self.configs.model_conf.classifier)
            cls_conf["num_speakers"] = num_class
            self.classifier = SpeakerIdentification(dtype=self.amp_dtype,
                                                    **cls_conf)
            self.criterion = build_loss(self.configs)
            if self.configs.loss_conf.get("use_margin_scheduler", False):
                ms_args = dict(
                    increase_start_epoch=int(
                        self.configs.train_conf.max_epoch * 0.3),
                    fix_epoch=int(self.configs.train_conf.max_epoch * 0.7),
                    initial_margin=0.0, final_margin=0.3)
                ms_args.update(self.configs.loss_conf.get(
                    "margin_scheduler_args", {}))
                self.margin_scheduler = MarginScheduler(
                    criterion=self.criterion,
                    step_per_epoch=len(self.train_loader), **ms_args)
            # gradient accumulation: train_conf.accum_steps microbatches
            # per optimizer update (effective batch = accum_steps x
            # batch_size; useful where the per-chip batch is memory-bound
            # — no reference analogue). The LR schedule paces on
            # OPTIMIZER updates, so step_per_epoch shrinks accordingly.
            accum = int(self.configs.train_conf.get("accum_steps", 1))
            self.accum_steps = max(accum, 1)
            steps_per_epoch = max(len(self.train_loader)
                                  // self.accum_steps, 1)
            self.lr_schedule = build_lr_scheduler(
                step_per_epoch=steps_per_epoch, configs=self.configs)
            self.optimizer = build_optimizer(self.lr_schedule, self.configs)
            if self.accum_steps > 1:
                self.optimizer = optax.MultiSteps(
                    self.optimizer, every_k_schedule=self.accum_steps)
                logger.info(f"gradient accumulation: {self.accum_steps} "
                            f"microbatches per optimizer update")

            dataset_args = self.configs.dataset_conf.get("dataset", {})
            self.augmenter = DeviceAugmenter(
                self.data_augment_configs,
                sample_rate=dataset_args.get("sample_rate", 16000),
                clip_seconds=dataset_args.get("max_duration", 3),
                target_db=(dataset_args.get("target_dB", -20)
                           if dataset_args.get("use_dB_normalization", True)
                           else None))
        self._init_state(input_size, is_train)

    def _init_state(self, input_size, is_train):
        t_probe = self.audio_featurizer.num_frames(
            int(self.configs.dataset_conf.get("dataset", {})
                .get("max_duration", 3) * 16000))
        probe = jnp.zeros((2, max(t_probe, 98), input_size), jnp.float32)
        rng = jax.random.PRNGKey(1000)  # reference seeds 1000

        def init_fn():
            variables = self.model.init(rng, probe, train=False)
            params = {"backbone": variables["params"]}
            batch_stats = {"backbone": variables.get("batch_stats", {})}
            loss_params = {}
            if is_train:
                emb = jnp.zeros(
                    (2, getattr(self.model, "embd_dim", 192)), jnp.float32)
                cvars = self.classifier.init(rng, emb, train=False)
                params["classifier"] = cvars["params"]
                batch_stats["classifier"] = cvars.get("batch_stats", {})
                loss_params = self.criterion.init_params()
            opt_state = (self.optimizer.init((params, loss_params))
                         if is_train else ())
            return TrainState(params=params, batch_stats=batch_stats,
                              loss_params=loss_params, opt_state=opt_state,
                              step=jnp.zeros((), jnp.int32))

        # params replicated across the mesh
        state_sharding = replicated_sharding(self.mesh)
        self.state = jax.jit(init_fn, out_shardings=state_sharding)()
        rank, _ = local_process_info()
        if rank == 0 and is_train:
            # per-layer summary table at setup, like the reference's
            # ``paddle.summary`` call (reference ``ppvector/trainer.py:200``)
            try:
                print(self.model.tabulate(
                    rng, probe, train=False, depth=3,
                    console_kwargs={"width": 120, "force_terminal": False}))
            except Exception as e:  # pragma: no cover - cosmetic only
                logger.warning(f"model summary unavailable: {e}")
        n = _count_params(self.state.params["backbone"])
        logger.info(f"backbone parameters: {n / 1e6:.2f}M "
                    f"({self.configs.model_conf.model})")

    # ------------------------------------------------------------------
    # the hot path
    # ------------------------------------------------------------------
    def _build_train_step(self):
        model, classifier = self.model, self.classifier
        criterion = self.criterion
        optimizer = self.optimizer
        featurize = self.audio_featurizer.featurize
        augmenter = self.augmenter
        loss_name = self._loss_name()
        sub_k = (self.configs.loss_conf.get("loss_args", {}).get("K", 3)
                 if loss_name == "SubCenterLoss" else 1)
        use_remat = bool(self.configs.train_conf.get("enable_remat", False))

        dither = getattr(self.audio_featurizer, "dither", 0.0)

        @partial(jax.jit, donate_argnums=(0,),
                 static_argnames=("from_waveforms",))
        def train_step(state, batch_data, lens_ratio, labels, margin, rng,
                       banks=None, from_waveforms=True):
            aug_rng, spec_rng, feat_rng = jax.random.split(jax.random.fold_in(
                rng, state.step), 3)
            if from_waveforms:
                if batch_data.dtype == jnp.int16:
                    batch_data = batch_data.astype(jnp.float32) / 32768.0
                waves = augmenter(batch_data, aug_rng, valid_ratio=lens_ratio,
                                  banks=banks)
                feats = featurize(waves, input_lens_ratio=lens_ratio,
                                  **({"rng": feat_rng} if dither > 0 else {}))
            else:
                feats = batch_data
            feats = augmenter.augment_features(feats, spec_rng)

            def backbone_fwd(backbone_params, feats):
                variables = {"params": backbone_params,
                             "batch_stats": state.batch_stats["backbone"]}
                # length-aware pooling also in training (short clips are
                # zero-padded to the fixed crop length; precomputed-feature
                # batches are bucket-padded) — both modes mask, matching eval
                return model.apply(variables, feats, train=True,
                                   lengths=lens_ratio,
                                   mutable=["batch_stats"])

            if use_remat:
                # trade FLOPs for activation memory (useful for very large
                # batches; measured slower when memory is not the limit)
                backbone_fwd = jax.checkpoint(backbone_fwd)

            def loss_fn(params, loss_params):
                emb, mut_b = backbone_fwd(params["backbone"], feats)
                cvars = {"params": params["classifier"],
                         "batch_stats": state.batch_stats["classifier"]}
                outputs, mut_c = classifier.apply(cvars, emb, train=True,
                                                  mutable=["batch_stats"])
                loss = criterion(outputs, labels, margin=margin,
                                 params=loss_params or None)
                new_stats = {"backbone": mut_b["batch_stats"],
                             "classifier": mut_c["batch_stats"]}
                return loss, (outputs["logits"], new_stats)

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, state.loss_params)
            updates, new_opt = optimizer.update(
                grads, state.opt_state, (state.params, state.loss_params))
            new_params, new_loss_params = optax.apply_updates(
                (state.params, state.loss_params), updates)

            if sub_k > 1:
                logits = jnp.max(
                    logits.reshape(logits.shape[0], -1, sub_k), axis=2)
            acc = jnp.mean(
                (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))
            new_state = state.replace(params=new_params,
                                      batch_stats=new_stats,
                                      loss_params=new_loss_params,
                                      opt_state=new_opt,
                                      step=state.step + 1)
            return new_state, {"loss": loss, "acc": acc}

        return train_step

    def _build_embed_fn(self):
        model = self.model
        featurize = self.audio_featurizer.featurize
        dither = getattr(self.audio_featurizer, "dither", 0.0)

        @partial(jax.jit, static_argnames=("from_waveforms",))
        def embed(variables, batch_data, lens_ratio, from_waveforms=True):
            if from_waveforms:
                # fixed key -> deterministic (reproducible) eval dither
                feats = featurize(batch_data, input_lens_ratio=lens_ratio,
                                  **({"rng": jax.random.PRNGKey(0)}
                                     if dither > 0 else {}))
            else:
                feats = batch_data
            # lengths make the pooling statistics padding-invariant
            return model.apply(variables, feats, train=False,
                               lengths=lens_ratio)

        return embed

    def _backbone_variables(self):
        return {"params": self.state.params["backbone"],
                "batch_stats": self.state.batch_stats["backbone"]}

    def _maybe_fast_eval(self, variables, mesh=None):
        """Masked Pallas-trunk embed for the per-epoch eval (CAM++ on
        TPU): weights ride as traced args, so every epoch's checkpoint
        reuses the same compiled program per eval bucket. With ``mesh``
        (>1 devices) the same kernel stack runs data-parallel under
        ``jax.shard_map`` — GSPMD can't partition the Mosaic custom
        calls, so the plain jitted path would silently drop them.
        Returns a ``(waves np, ratios np) -> embeddings`` callable or
        None."""
        from .models.campplus import CAMPPlus
        if not (isinstance(self.model, CAMPPlus)
                and jax.default_backend() == "tpu"
                and getattr(self.model, "growth_rate", None) == 32
                and getattr(self.model, "init_channels", None) == 128
                and getattr(self.model, "bn_size", None) == 4
                and self.configs.preprocess_conf.feature_method == "Fbank"
                and self.audio_featurizer.feature_dim == 80
                and getattr(self.audio_featurizer, "dither", 0.0) == 0.0):
            return None
        try:
            from .models.pallas_campplus import (
                default_pack, make_campplus_eval_embed_fn,
                make_campplus_sharded_eval_embed_fn, trunk_plan)
            # cache the jitted packers: a fresh jit(lambda) per call
            # would retrace/recompile the weight pack on every eval
            if getattr(self, "_fast_eval_pack", None) is None:
                self._fast_eval_pack = jax.jit(
                    lambda v: default_pack(v, trunk_plan()))
            packed = self._fast_eval_pack(variables)
            if mesh is not None and mesh.devices.size > 1:
                from .models.pallas_fcm import pack_fcm
                if getattr(self, "_fast_eval_fcm_pack", None) is None:
                    self._fast_eval_fcm_pack = jax.jit(pack_fcm)
                packed_fcm = self._fast_eval_fcm_pack(variables)
                # per-mesh closure cache (the eval mesh is stable within
                # a run: the global mesh or this host's local devices)
                cached_mesh, cached_fn = getattr(
                    self, "_fast_eval_fn_sharded", (None, None))
                if cached_mesh is not mesh:
                    cached_fn = make_campplus_sharded_eval_embed_fn(
                        self.model, self.audio_featurizer, mesh)
                    self._fast_eval_fn_sharded = (mesh, cached_fn)
                fn_sharded = cached_fn
                return lambda waves, ratios: fn_sharded(
                    variables, packed, packed_fcm, waves, ratios)
            if self._fast_eval_fn is None:
                self._fast_eval_fn = make_campplus_eval_embed_fn(
                    self.model, self.audio_featurizer)
            fn = self._fast_eval_fn
            return lambda waves, ratios: fn(variables, packed, waves,
                                            ratios)
        except Exception as e:  # pragma: no cover - fall back to XLA
            logger.warning(f"Pallas eval path disabled ({e!r})")
            return None

    # ------------------------------------------------------------------
    # public API (reference surface)
    # ------------------------------------------------------------------
    def train(self, save_model_path="models/", log_dir="log/",
              resume_model=None, pretrained_model=None, do_eval=True,
              max_epochs=None, profiler_dir=None):
        """``profiler_dir``: when set, captures a ``jax.profiler`` device
        trace of training steps 10-20 into that directory (open with
        TensorBoard) — the tracing hook the reference lacks (SURVEY.md §5).
        """
        rank, world = local_process_info()
        self._profiler_dir = profiler_dir if rank == 0 else None
        self._profiling = False
        self.train_window_speeds = []
        writer = None
        if rank == 0 and log_dir:
            try:
                from tensorboardX import SummaryWriter
                writer = SummaryWriter(logdir=log_dir)
            except Exception as e:
                logger.warning(f"tensorboard writer unavailable: {e}")

        self.__setup_dataloader(is_train=True)
        self.__setup_model(input_size=self.audio_featurizer.feature_dim,
                           is_train=True)
        if pretrained_model is not None:
            merged = load_pretrained(
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats,
                 "loss_params": self.state.loss_params}, pretrained_model)
            self.state = self.state.replace(
                params=merged["params"], batch_stats=merged["batch_stats"],
                loss_params=merged["loss_params"])
        if save_model_path or resume_model:
            self.state, last_epoch, best_eer = load_checkpoint(
                self.configs, self.state, save_model_path or "",
                resume_model)
        else:
            last_epoch, best_eer = 0, 1.0
        if self.margin_scheduler:
            self.margin_scheduler.step(current_step=int(self.state.step))
        if last_epoch:
            # resume continues the (seed, epoch) sample stream where it
            # left off instead of replaying epoch 0's batch order (the
            # reference got this implicitly from its scheduler replay)
            self.train_loader.batch_sampler.set_epoch(last_epoch)

        logger.info(f"train data: {len(self.train_dataset)}, "
                    f"devices: {jax.device_count()} "
                    f"(processes: {world})")
        self._jit_train_step = self._build_train_step()
        base_rng = jax.random.PRNGKey(1000 + rank)

        max_epoch = max_epochs or self.configs.train_conf.max_epoch
        self.max_step = len(self.train_loader) * max_epoch
        self.train_step_num = int(self.state.step)
        self.test_log_step = self.train_log_step = 0
        data_sharding = batch_sharding(self.mesh)

        # checkpoint writes run on a background thread by default: the
        # device->host snapshot stays synchronous (the train step donates
        # its buffers) but serialization + disk IO overlap the next epoch.
        # train() drains the queue before returning.
        self._async_saver = (
            AsyncSaver() if (rank == 0 and save_model_path
                             and self.configs.train_conf.get(
                                 "async_checkpoint", True))
            else None)
        try:
            self._train_epochs(last_epoch, max_epoch, writer, rank, base_rng,
                               data_sharding, save_model_path, do_eval,
                               best_eer)
        finally:
            if self._async_saver is not None:
                self._async_saver.close()
                self._async_saver = None

    def _train_epochs(self, last_epoch, max_epoch, writer, rank, base_rng,
                      data_sharding, save_model_path, do_eval, best_eer):
        for epoch_id in range(last_epoch, max_epoch):
            if self.stop_train:
                break
            epoch_id += 1
            start_epoch = time.time()
            self.__train_epoch(epoch_id, max_epoch, writer, rank,
                               base_rng, data_sharding, save_model_path)
            # multi-process eval is COLLECTIVE (rank-sharded embedding +
            # allgather): every rank participates; logging/checkpoints
            # below stay rank-0-gated
            world = jax.process_count()
            eval_ok = False
            if do_eval and not self.stop_eval and (rank == 0 or world > 1):
                if rank == 0:
                    logger.info("=" * 70)
                try:
                    (self.eval_eer, self.eval_min_dcf,
                     self.eval_threshold) = self.evaluate()
                    eval_ok = True
                except Exception:
                    # a broken eval config (e.g. missing trials list) must
                    # not discard the epoch's training — log loudly, skip
                    # the metrics, and still write the epoch checkpoint
                    logger.exception(
                        "per-epoch evaluation failed; the epoch checkpoint "
                        "is still saved below")
            if rank == 0 and eval_ok:
                logger.info(
                    f"Test epoch: {epoch_id}, time/epoch: "
                    f"{timedelta(seconds=int(time.time() - start_epoch))}, "
                    f"threshold: {self.eval_threshold:.2f}, "
                    f"EER: {self.eval_eer:.5f}, "
                    f"MinDCF: {self.eval_min_dcf:.5f}")
                logger.info("=" * 70)
                if writer is not None:
                    writer.add_scalar("Test/threshold", self.eval_threshold,
                                      self.test_log_step)
                    writer.add_scalar("Test/min_dcf", self.eval_min_dcf,
                                      self.test_log_step)
                    writer.add_scalar("Test/eer", self.eval_eer,
                                      self.test_log_step)
                self.test_log_step += 1
                if self.eval_eer <= best_eer and save_model_path:
                    best_eer = self.eval_eer
                    save_checkpoint(self.configs, self.state, save_model_path,
                                    epoch_id, eer=self.eval_eer,
                                    min_dcf=self.eval_min_dcf,
                                    threshold=self.eval_threshold,
                                    margin=self._margin(), best_model=True,
                                    async_saver=self._async_saver)
            if rank == 0 and save_model_path:
                save_checkpoint(self.configs, self.state, save_model_path,
                                epoch_id, eer=self.eval_eer,
                                min_dcf=self.eval_min_dcf,
                                threshold=self.eval_threshold,
                                margin=self._margin(),
                                async_saver=self._async_saver)

    def _margin(self):
        return (self.margin_scheduler.get_margin()
                if self.margin_scheduler else
                self.configs.loss_conf.get("loss_args", {}).get("margin", 0.2))

    def _device_prefetch(self, loader):
        """Iterate the loader with one batch prefetched *onto the device*
        in a background thread, overlapping host→device transfer with the
        previous step's compute (matters on hosts with slow links)."""
        import queue
        import threading
        q = queue.Queue(maxsize=2)
        stop = threading.Event()

        def put(item):
            # bounded put that gives up when the consumer is gone —
            # a plain q.put would block this thread forever (holding
            # device-resident batches) if the consumer breaks early
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for kind, data, labels, lens in loader:
                    sharded = shard_batch((data, labels, lens), self.mesh)
                    if not put((kind,) + sharded):
                        return
            except Exception as e:
                put(e)
                return
            put(None)

        threading.Thread(target=producer, daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            # runs when the consumer breaks (stop_train) or finishes:
            # release the producer so it drops its references
            stop.set()

    def __train_epoch(self, epoch_id, max_epoch, writer, rank, base_rng,
                      data_sharding, save_model_path):
        batch_size = self.configs.dataset_conf.sampler.batch_size
        log_interval = self.configs.train_conf.log_interval
        last_log_time = time.time()
        last_log_batch = 0
        world_bs = batch_size  # sampler batch is per-process
        # per-epoch refresh of the noise/RIR banks (big corpora rotate a
        # new random file subset + crop windows each epoch); banks ride
        # the step as traced args so the refresh needs no recompile
        banks = self.augmenter.refresh(epoch_id)
        for batch_id, (kind, data, labels, lens) in enumerate(
                self._device_prefetch(self.train_loader)):
            if self.stop_train:
                break
            if self.margin_scheduler:
                self.margin_scheduler.step(current_step=self.train_step_num)
            margin = np.float32(self._margin())
            if getattr(self, "_profiler_dir", None):
                if self.train_step_num == 10 and not self._profiling:
                    jax.profiler.start_trace(self._profiler_dir)
                    self._profiling = True
                elif self.train_step_num == 20 and self._profiling:
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                    self._profiling = False
                    logger.info(f"profiler trace saved: {self._profiler_dir}")
            # async dispatch: no host sync except at log points
            self.state, metrics = self._jit_train_step(
                self.state, data, lens, labels, margin, base_rng, banks,
                from_waveforms=(kind == "waveforms"))
            self.train_step_num += 1

            if rank == 0 and batch_id % log_interval == 0:
                metrics = jax.device_get(metrics)  # sync point
                now = time.time()
                n_batches = max(batch_id - last_log_batch, 1)
                step_sec = (now - last_log_time) / n_batches
                last_log_time, last_log_batch = now, batch_id
                train_speed = world_bs / step_sec
                # windowed speeds kept for tooling (host_pipeline_bench
                # separates steady-state from the compile-laden first window)
                self.train_window_speeds.append(train_speed)
                self.train_eta_sec = step_sec * (self.max_step
                                                 - self.train_step_num)
                eta = timedelta(seconds=int(self.train_eta_sec))
                self.train_loss = float(metrics["loss"])
                self.train_acc = float(metrics["acc"])
                lr = float(self.lr_schedule(self.train_step_num
                                            // self.accum_steps))
                margin_str = (f"margin: {self._margin():.5f}"
                              if self.margin_scheduler else "")
                logger.info(
                    f"Train epoch: [{epoch_id}/{max_epoch}], "
                    f"batch: [{batch_id}/{len(self.train_loader)}], "
                    f"loss: {self.train_loss:.5f}, "
                    f"accuracy: {self.train_acc:.5f}, "
                    f"learning rate: {lr:.8f}, {margin_str} "
                    f"speed: {train_speed:.2f} data/sec, eta: {eta}")
                if writer is not None:
                    writer.add_scalar("Train/Loss", self.train_loss,
                                      self.train_log_step)
                    writer.add_scalar("Train/Accuracy", self.train_acc,
                                      self.train_log_step)
                    writer.add_scalar("Train/lr", lr, self.train_log_step)
                    if self.margin_scheduler:
                        writer.add_scalar("Train/margin", self._margin(),
                                          self.train_log_step)
                self.train_log_step += 1
            if (batch_id % 10000 == 0 and batch_id != 0 and rank == 0
                    and save_model_path):
                # the epoch is NOT complete: record last_epoch-1 so a
                # crash-resume replays this epoch from these weights
                # rather than silently skipping its remaining batches
                save_checkpoint(self.configs, self.state, save_model_path,
                                epoch_id, margin=self._margin(),
                                async_saver=self._async_saver,
                                completed_epoch=epoch_id - 1)

    # ------------------------------------------------------------------
    def _embed_loader(self, loader, desc):
        """Embed a whole loader, data-parallel over the mesh: batches pad
        up to a multiple of the device count (padding rows discarded), so
        eval scales across chips like training does.

        Multi-process runs shard the LIST across processes (the eval
        samplers are rank-sharded), each process embeds its shard on its
        own local devices, and the embeddings are allgathered host-side —
        the whole pod works on eval instead of one chip (the reference
        evaluates on rank 0 only, ``trainer.py:343-346``)."""
        if self._jit_embed is None:
            self._jit_embed = self._build_embed_fn()
        multi_process = jax.process_count() > 1
        eval_mesh = None if multi_process else self.mesh
        if multi_process:
            # The global mesh can't be driven from a single process (a
            # local jit over globally-sharded arrays would insert
            # collectives the other ranks never join), but a HOST-LOCAL
            # mesh over this process's own devices is fine: the embed fn
            # has no collectives, so each rank runs plain data-parallel
            # SPMD over jax.local_devices() and the pod's whole chip
            # count works on eval (reference evals on rank 0 only).
            local = jax.local_devices()
            host_vars = jax.device_get(self._backbone_variables())
            if len(local) > 1:
                eval_mesh = create_mesh(local)
                variables = jax.device_put(
                    host_vars, replicated_sharding(eval_mesh))
                n_dev = len(local)
            else:
                variables = jax.device_put(host_vars, local[0])
                n_dev = 1
        else:
            variables = self._backbone_variables()
            n_dev = 1 if self.mesh is None else self.mesh.devices.size
        fast = self._maybe_fast_eval(
            variables, mesh=eval_mesh if n_dev > 1 else None)
        feats, labels = [], []
        for kind, data, y, lens in loader:
            if self.stop_eval:
                break
            b = data.shape[0]
            if fast is not None and kind == "waveforms":
                try:
                    emb = fast(np.asarray(data), np.asarray(lens))
                    feats.append(np.asarray(emb))
                    labels.append(np.asarray(y))
                    continue
                except Exception as e:  # pragma: no cover - device-only
                    # a kernel that fails on this part must not take the
                    # per-epoch eval down — disable and use the XLA path
                    logger.warning(f"Pallas eval path failed ({e!r}); "
                                   "falling back to XLA")
                    fast = None
            pad = (-b) % n_dev
            if pad:
                data = np.concatenate(
                    [data, np.zeros((pad,) + data.shape[1:], data.dtype)])
                lens = np.concatenate([lens, np.ones(pad, lens.dtype)])
            if n_dev > 1:
                data, lens = shard_batch((data, lens), eval_mesh)
            emb = self._jit_embed(variables, jnp.asarray(data),
                                  jnp.asarray(lens),
                                  from_waveforms=(kind == "waveforms"))
            feats.append(np.asarray(emb)[:b])
            labels.append(np.asarray(y))
        feats = (np.concatenate(feats) if feats
                 else np.zeros((0, getattr(self.model, "embd_dim", 192)),
                               np.float32))
        labels = (np.concatenate(labels).astype(np.int32) if labels
                  else np.zeros((0,), np.int32))
        if multi_process:
            # UNCONDITIONALLY collective: stop_eval may be set on only
            # some ranks (it's a per-process flag) — a rank that skipped
            # the gather would deadlock every other rank inside
            # process_allgather. A stopped rank simply contributes the
            # partial shard it embedded before breaking out.
            feats, labels = allgather_ragged(feats, labels)
        return feats, labels

    def evaluate(self, resume_model=None, save_image_path=None):
        """Returns (eer, min_dcf, threshold) — reference
        ``trainer.py:367-447`` semantics with on-chip cosine scoring."""
        if self.enroll_loader is None or self.trials_loader is None:
            self.__setup_dataloader()
        if self.enroll_loader is None or self.trials_loader is None:
            raise FileNotFoundError(
                "evaluate() needs dataset_conf.enroll_list and "
                "dataset_conf.trials_list to exist "
                f"(enroll_list={self.configs.dataset_conf.get('enroll_list')}, "
                f"trials_list={self.configs.dataset_conf.get('trials_list')})")
        if self.model is None:
            self.__setup_model(input_size=self.audio_featurizer.feature_dim)
        if resume_model is not None:
            merged = load_pretrained(
                {"params": self.state.params,
                 "batch_stats": self.state.batch_stats,
                 "loss_params": self.state.loss_params}, resume_model)
            self.state = self.state.replace(
                params=merged["params"], batch_stats=merged["batch_stats"])

        enroll_features, enroll_labels = self._embed_loader(
            self.enroll_loader, "enroll")
        trials_features, trials_labels = self._embed_loader(
            self.trials_loader, "trials")
        if self.stop_eval:
            return -1, -1, -1

        # single on-chip matmul replaces the reference's per-trial loop
        scores, match = self._score_all(trials_features, enroll_features,
                                        trials_labels, enroll_labels)
        fnr, fpr, thresholds = compute_fnr_fpr(scores, match)
        eer, threshold = compute_eer(fnr, fpr, scores)
        min_dcf = compute_dcf(fnr, fpr)
        eer, min_dcf, threshold = float(eer), float(min_dcf), float(threshold)

        if save_image_path:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            index = int(np.argmin(np.abs(thresholds - threshold)))
            plt.figure()
            plt.plot(thresholds, fnr, color="blue", linestyle="-", label="fnr")
            plt.plot(thresholds, fpr, color="red", linestyle="-", label="fpr")
            plt.plot(threshold, fpr[index], "ro-")
            plt.text(threshold, fpr[index],
                     (round(threshold, 3), round(float(fpr[index]), 5)),
                     color="red")
            plt.xlabel("threshold")
            plt.title("fnr and fpr")
            plt.grid(True)
            os.makedirs(save_image_path, exist_ok=True)
            out = os.path.join(save_image_path, "result.png")
            plt.savefig(out)
            logger.info(f"result plot saved to: {out}")
        return eer, min_dcf, threshold

    @staticmethod
    def _score_all(trials, enrolls, trials_labels, enroll_labels):
        """All-pairs cosine scores + same-speaker labels, flattened
        trial-major like the reference loop (``trainer.py:416-423``)."""
        t = jnp.asarray(trials)
        e = jnp.asarray(enrolls)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=1, keepdims=True), 1e-12)
        e = e / jnp.maximum(jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12)
        scores = np.asarray(jnp.matmul(t, e.T)).reshape(-1).astype(np.float32)
        match = (trials_labels[:, None]
                 == enroll_labels[None, :]).reshape(-1).astype(np.int32)
        return scores, match

    # ------------------------------------------------------------------
    def extract_features(self, save_dir="dataset/features", max_duration=100):
        """Write per-utterance ``.npy`` features + ``*_features.txt`` lists
        (reference ``trainer.py:134-157``)."""
        self.audio_featurizer = AudioFeaturizer(
            feature_method=self.configs.preprocess_conf.feature_method,
            method_args=self.configs.preprocess_conf.get("method_args", {}))
        for data_list in [self.configs.dataset_conf.train_list,
                          self.configs.dataset_conf.enroll_list,
                          self.configs.dataset_conf.trials_list]:
            if not data_list or not os.path.exists(data_list):
                continue
            dataset_args = dict(self.configs.dataset_conf.get("dataset", {}))
            dataset_args["max_duration"] = max_duration
            ds = SpeakerDataset(data_list_path=data_list,
                                mode="extract_feature", **dataset_args)
            save_list = data_list.replace(".txt", "_features.txt")
            counter = 0
            with open(save_list, "w", encoding="utf-8") as f:
                for i in range(len(ds)):
                    samples, label, valid = ds[i]
                    n_frames = self.audio_featurizer.num_frames(valid)
                    # pad to a bucket for compile reuse, trim exactly
                    from .data_utils.collate import bucket_length
                    pad_len = bucket_length(len(samples))
                    padded = np.zeros((1, pad_len), np.float32)
                    padded[0, :len(samples)] = samples
                    ratio = np.asarray([len(samples) / pad_len], np.float32)
                    feat = np.asarray(
                        self.audio_featurizer(padded, ratio))[0, :n_frames]
                    save_path = os.path.join(
                        save_dir, str(label),
                        f"{int(time.time() * 1000)}_{counter}.npy")
                    counter += 1
                    os.makedirs(os.path.dirname(save_path), exist_ok=True)
                    np.save(save_path, feat)
                    f.write(f"{save_path}\t{label}\n")
            logger.info(f"features extracted for {data_list} -> {save_list}")

    def export(self, save_model_path="models/",
               resume_model="models/CAMPPlus_Fbank/best_model/",
               export_batch=None, export_seconds=3):
        """Save a backbone-only inference bundle (reference
        ``trainer.py:449-474``'s static-graph export): params + config, plus
        a serialized StableHLO module (``model.stablehlo``) of the full
        wav→features→embedding forward — the TPU-native equivalent of
        ``paddle.jit.save``.

        ``export_batch=None`` (default) exports with a *symbolic* batch
        dimension, so one module serves any batch size; pass an int to pin
        it. ``export_seconds=None`` additionally makes the audio length
        symbolic: the module accepts any frame-aligned waveform length
        ``160*f + 240`` samples at 16 kHz (i.e. exactly ``f`` Kaldi frames
        of 25 ms / 10 ms — pad or trim to the next such length host-side),
        so one module serves every duration bucket. An int keeps the
        length static at ``export_seconds`` seconds."""
        self.audio_featurizer = AudioFeaturizer(
            feature_method=self.configs.preprocess_conf.feature_method,
            method_args=self.configs.preprocess_conf.get("method_args", {}))
        self.__setup_model(input_size=self.audio_featurizer.feature_dim)
        merged = load_pretrained(
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats,
             "loss_params": self.state.loss_params}, resume_model)
        self.state = self.state.replace(params=merged["params"],
                                        batch_stats=merged["batch_stats"])
        infer_dir = os.path.join(
            save_model_path,
            f"{self.configs.model_conf.model}_"
            f"{self.configs.preprocess_conf.feature_method}", "infer")
        os.makedirs(infer_dir, exist_ok=True)
        save_msgpack(jax.device_get(
            {"params": self.state.params,
             "batch_stats": self.state.batch_stats,
             "loss_params": {}}),
            os.path.join(infer_dir, "model.msgpack"))
        import json
        with open(os.path.join(infer_dir, "inference.json"), "w",
                  encoding="utf-8") as f:
            json.dump({"model": self.configs.model_conf.model,
                       "feature_method":
                           self.configs.preprocess_conf.feature_method,
                       "export_batch": export_batch,
                       "export_seconds": export_seconds},
                      f, indent=2)
        # serialized StableHLO of wav -> embedding (weights baked in).
        # Force the jnp fbank path: the Pallas kernel neither lowers with a
        # symbolic batch dim nor serializes its tpu_custom_call portably.
        try:
            featurizer = self.audio_featurizer
            if (self.configs.preprocess_conf.feature_method == "Fbank"):
                from .ops.features import compute_feature

                def featurize(waves):
                    return compute_feature(
                        waves, "Fbank", use_pallas=False,
                        **dict(self.configs.preprocess_conf.get(
                            "method_args", {})))
            else:
                featurize = featurizer.featurize
            variables = {"params": self.state.params["backbone"],
                         "batch_stats": self.state.batch_stats["backbone"]}
            model = self.model

            def forward(waves):
                return model.apply(variables, featurize(waves), train=False)

            sr = self.configs.dataset_conf.get("dataset", {}).get(
                "sample_rate", 16000)
            # one symbolic-length module for all durations: f Kaldi frames
            # <=> 160*f + 240 samples (frame_shift 10 ms, frame_length
            # 25 ms at 16 kHz)
            b_spec = "b" if export_batch is None else str(export_batch)
            if export_seconds is None:
                ma = dict(self.configs.preprocess_conf.get(
                    "method_args", {}))
                if self.configs.preprocess_conf.feature_method == "Fbank":
                    shift = int(sr * float(ma.get("frame_shift", 10.0))
                                / 1000)
                    flen = int(sr * float(ma.get("frame_length", 25.0))
                               / 1000)
                    l_spec = f"{shift}*f + {flen - shift}"
                else:
                    # centred-STFT methods: f+1 frames at hop-aligned L
                    l_spec = f"{int(ma.get('hop_length', 160))}*f"
            else:
                l_spec = str(export_seconds * sr)
            constraints = ["f >= 10"] if export_seconds is None else ()
            shape = jax.export.symbolic_shape(f"{b_spec}, {l_spec}",
                                              constraints=constraints)
            example = jax.ShapeDtypeStruct(shape, jnp.float32)
            exported = jax.export.export(jax.jit(forward))(example)
            with open(os.path.join(infer_dir, "model.stablehlo"), "wb") as f:
                f.write(exported.serialize())
        except Exception as e:
            logger.warning(f"StableHLO export skipped: {e}")
        logger.info(f"inference model saved: {infer_dir}")
        return infer_dir


# reference-compatible alias (``ppvector.trainer.PPVectorTrainer``)
PPVectorTrainer = Trainer
