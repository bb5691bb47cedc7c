"""Inference surface: 1:1 contrast, 1:N recognition over a persistent
audio database, and speaker diarization.

API parity with reference ``ppvector/predict.py:24-396``
(``PPVectorPredictor``): ``predict``, ``predict_batch``, ``contrast``,
``register``, ``recognition``, ``get_users``, ``remove_user``,
``speaker_diarization``, with the same pickle index format
(``audio_indexes.bin`` holding users_name / faces_feature /
users_image_path) and per-user mean voiceprints for retrieval.

TPU-first differences: batch embedding pads to bucketed lengths (a handful
of compiled programs instead of one per shape), features are length-masked
on device, and retrieval cosine scoring is one matmul.
"""

import os
import pickle
import shutil
from io import BufferedReader

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from .data_utils.collate import bucket_length
from .infer_utils.speaker_diarization import SpeakerDiarization
from .models import build_model
from .ops.audio import AudioSegment
from .ops.features import AudioFeaturizer
from .utils.logger import logger
from .utils.utils import dict_to_object, print_arguments, select_platform

__all__ = ["Predictor"]


class Predictor:
    def __init__(self,
                 configs,
                 threshold=0.6,
                 audio_db_path=None,
                 model_path="models/CAMPPlus_Fbank/best_model/",
                 use_gpu=True,
                 data_parallel=False):
        """``data_parallel=True`` shards ``predict_batch`` over every
        local device (``jax.sharding.Mesh`` + batch sharding — the
        serving-side analogue of the trainer's data parallelism; the
        reference Predictor is single-GPU only). Embarrassingly parallel:
        XLA inserts no collectives, each chip embeds its batch shard."""
        select_platform(use_gpu)
        if isinstance(configs, str):
            with open(configs, "r", encoding="utf-8") as f:
                configs = yaml.load(f.read(), Loader=yaml.FullLoader)
            print_arguments(configs=configs)
        self.configs = dict_to_object(configs)
        self.threshold = threshold
        self._audio_featurizer = AudioFeaturizer(
            feature_method=self.configs.preprocess_conf.feature_method,
            method_args=self.configs.preprocess_conf.get("method_args", {}))

        self.model = build_model(
            input_size=self._audio_featurizer.feature_dim,
            configs=self.configs)
        if os.path.isdir(model_path):
            orbax_dir = os.path.join(model_path, "model.orbax")
            model_path = (orbax_dir if os.path.isdir(orbax_dir)
                          else os.path.join(model_path, "model.msgpack"))
        assert os.path.exists(model_path), f"model not found: {model_path}"
        if os.path.isdir(model_path):  # orbax checkpoint directory
            from .utils.checkpoint import load_orbax
            raw = load_orbax(None, model_path)
        else:
            # restore raw msgpack and take the backbone collections
            from flax import serialization
            with open(model_path, "rb") as f:
                raw = serialization.msgpack_restore(f.read())
        params = raw["params"]
        stats = raw.get("batch_stats", {})
        if "backbone" in params:
            params, stats = params["backbone"], stats.get("backbone", {})
        self.variables = {"params": params, "batch_stats": stats}
        logger.info(f"loaded model weights: {model_path}")

        self._mesh = None
        if data_parallel and len(jax.local_devices()) > 1:
            from .parallel.mesh import create_mesh
            self._mesh = create_mesh(jax.local_devices())
            logger.info(f"data-parallel serving over "
                        f"{self._mesh.devices.size} devices")
        self._jit_embed = jax.jit(self._embed_impl)
        # longest bucket served by the Pallas trunk kernel: 40 s at
        # 16 kHz (t_pad 2048 at u=1 — the looped kernel variant compiles
        # in ~15-20 s per bucket and VMEM bounds the rest; the round-2
        # unrolled variant capped this at 4 s). Longer clips fall back
        # to XLA.
        self._FAST_PATH_MAX_SAMPLES = 640000
        self._embed_fast_sharded = None
        self._embed_fast = self._maybe_make_fast_embed()

        # voiceprint database state (reference ``predict.py:69-86``)
        self.audio_feature = None
        self.audio_feature_mean = None
        self.users_name = []
        self.users_audio_path = []
        self.users_name_mean = []
        self.audio_db_path = audio_db_path
        if self.audio_db_path is not None:
            self.audio_indexes_path = os.path.join(audio_db_path,
                                                   "audio_indexes.bin")
            self.__load_audio_db(self.audio_db_path)
        self.speaker_diarize = SpeakerDiarization()

    # ------------------------------------------------------------------
    # embedding core
    # ------------------------------------------------------------------
    def _maybe_make_fast_embed(self):
        """Whole-trunk Pallas inference path for CAM++ on TPU.

        Only valid for exact-length batches (no padding mask): single-clip
        ``predict`` and the equal-length diarization chunks — the hot
        serving paths. Returns None when inapplicable."""
        from .models.campplus import CAMPPlus
        if not (isinstance(self.model, CAMPPlus)
                and jax.default_backend() == "tpu"
                and getattr(self.model, "growth_rate", None) == 32
                and getattr(self.model, "init_channels", None) == 128
                and getattr(self.model, "bn_size", None) == 4
                # the packed trunk assumes the stock 80-mel Fbank front
                # end (FCM output 320 = 32 ch x 80/8 freqs)
                and self.configs.preprocess_conf.feature_method == "Fbank"
                and self._audio_featurizer.feature_dim == 80
                and getattr(self._audio_featurizer, "dither", 0.0) == 0.0):
            return None
        try:
            from .models.pallas_campplus import (
                make_campplus_embed_fn, make_campplus_masked_embed_fn,
                make_campplus_sharded_embed_fn)
            embed = make_campplus_embed_fn(self.model, self.variables)
            self._embed_fast_masked = make_campplus_masked_embed_fn(
                self.model, self.variables, self._audio_featurizer)
            if self._mesh is not None:
                # data-parallel serving keeps the kernel stack: shard_map
                # hands each device its batch shard (GSPMD can't
                # partition the Mosaic custom calls, so the plain jitted
                # path would drop them)
                self._embed_fast_sharded = make_campplus_sharded_embed_fn(
                    self.model, self.variables, self._mesh,
                    self._audio_featurizer)
        except Exception as e:  # pragma: no cover - fall back to XLA path
            logger.warning(
                f"Pallas fast inference path disabled ({e!r}); "
                "falling back to the XLA path (~30% slower)")
            return None

        @jax.jit
        def fast(waves):
            feats = self._audio_featurizer.featurize(waves)
            return embed(feats)

        return fast

    def _embed_impl(self, waves, lens_ratio):
        # fixed key -> deterministic inference when Fbank dither is on
        rng_kw = ({"rng": jax.random.PRNGKey(0)}
                  if getattr(self._audio_featurizer, "dither", 0.0) > 0
                  else {})
        feats = self._audio_featurizer.featurize(
            waves, input_lens_ratio=lens_ratio, **rng_kw)
        # lengths make the pooling statistics padding-invariant
        return self.model.apply(self.variables, feats, train=False,
                                lengths=lens_ratio)

    # ------------------------------------------------------------------
    # audio db persistence (pickle format of reference predict.py:89-109)
    # ------------------------------------------------------------------
    def __load_audio_indexes(self):
        if not os.path.exists(self.audio_indexes_path):
            return
        with open(self.audio_indexes_path, "rb") as f:
            indexes = pickle.load(f)
        for name, feature, path in zip(indexes["users_name"],
                                       indexes["faces_feature"],
                                       indexes["users_image_path"]):
            if not os.path.exists(path):
                continue
            self.users_name.append(name)
            self.users_audio_path.append(path)
            feature = np.asarray(feature)
            self.audio_feature = (
                feature[None] if self.audio_feature is None
                else np.vstack((self.audio_feature,
                                feature[None] if feature.ndim == 1
                                else feature)))

    def __write_index(self):
        with open(self.audio_indexes_path, "wb") as f:
            pickle.dump({"users_name": self.users_name,
                         "faces_feature": self.audio_feature,
                         "users_image_path": self.users_audio_path}, f)

    def __load_audio_db(self, audio_db_path):
        self.__load_audio_indexes()
        os.makedirs(audio_db_path, exist_ok=True)
        audios_path = []
        for name in sorted(os.listdir(audio_db_path)):
            audio_dir = os.path.join(audio_db_path, name)
            if not os.path.isdir(audio_dir):
                continue
            for file in sorted(os.listdir(audio_dir)):
                audios_path.append(
                    os.path.join(audio_dir, file).replace("\\", "/"))
        if len(audios_path) == 0 and self.audio_feature is None:
            return
        logger.info("loading voiceprint database...")
        batch_size = self.configs.dataset_conf.eval_conf.batch_size
        pending = []
        for audio_path in audios_path:
            if audio_path in self.users_audio_path:
                continue
            seg = self._load_audio(audio_path)
            self.users_name.append(os.path.basename(
                os.path.dirname(audio_path)))
            self.users_audio_path.append(audio_path)
            pending.append(seg.samples)
            if len(pending) == batch_size:
                self._append_features(pending)
                pending = []
        if pending:
            self._append_features(pending)
        assert (self.audio_feature is None
                or len(self.audio_feature) == len(self.users_name)
                == len(self.users_audio_path)), "database count mismatch!"
        self.__write_index()
        self._recompute_means()
        logger.info(f"voiceprint database ready: "
                    f"{len(self.users_name_mean)} users "
                    f"({self.users_name_mean})")

    def _append_features(self, samples_list):
        feats = self.predict_batch(samples_list)
        self.audio_feature = (feats if self.audio_feature is None
                              else np.vstack((self.audio_feature, feats)))

    def _recompute_means(self):
        self.users_name_mean = []
        self.audio_feature_mean = None
        if self.audio_feature is None:
            return
        for name in sorted(set(self.users_name)):
            rows = [i for i, n in enumerate(self.users_name) if n == name]
            mean = self.audio_feature[rows].mean(axis=0)
            self.audio_feature_mean = (
                mean[None] if self.audio_feature_mean is None
                else np.vstack((self.audio_feature_mean, mean[None])))
            self.users_name_mean.append(name)

    # ------------------------------------------------------------------
    @staticmethod
    def normalize_features(features):
        return features / np.linalg.norm(features, axis=1, keepdims=True)

    @staticmethod
    def cosine_score(f1, f2):
        """Cosine similarity between two 1-D embeddings."""
        return float(np.dot(f1, f2)
                     / (np.linalg.norm(f1) * np.linalg.norm(f2)))

    def __retrieval(self, np_feature, threshold=None):
        """Cosine retrieval against per-user mean voiceprints; one matmul
        (reference ``predict.py:173-187`` loops rows)."""
        if threshold is None:
            threshold = self.threshold
        feats = self.normalize_features(
            np.asarray(np_feature, np.float32))
        means = self.normalize_features(
            self.audio_feature_mean.astype(np.float32))
        similarities = feats @ means.T
        results = []
        for sim in similarities:
            idx = int(np.argmax(sim))
            score = float(sim[idx])
            if score >= threshold:
                results.append([self.users_name_mean[idx], round(score, 5)])
            else:
                results.append([None, None])
        return results

    def retrieve(self, np_features, threshold=None):
        """Public cosine retrieval: ``(N, D)`` embeddings -> list of
        ``[name, score]`` / ``[None, None]`` rows (serving front-ends
        that embed through a batcher call this with ready features).
        ``threshold`` overrides ``self.threshold`` for this call only."""
        return self.__retrieval(np_features, threshold=threshold)

    def _load_audio(self, audio_data, sample_rate=16000):
        """Accepts path / file object / bytes / ndarray / AudioSegment
        (reference ``predict.py:189-216``)."""
        if isinstance(audio_data, str):
            segment = AudioSegment.from_file(audio_data)
        elif isinstance(audio_data, BufferedReader):
            segment = AudioSegment.from_file(audio_data)
        elif isinstance(audio_data, np.ndarray):
            segment = AudioSegment.from_ndarray(audio_data, sample_rate)
        elif isinstance(audio_data, bytes):
            segment = AudioSegment.from_bytes(audio_data)
        elif isinstance(audio_data, AudioSegment):
            segment = audio_data
        else:
            raise TypeError(f"unsupported audio type: {type(audio_data)}")
        ds_conf = self.configs.dataset_conf.dataset
        assert segment.duration >= ds_conf.min_duration, (
            f"audio too short: minimum {ds_conf.min_duration}s, "
            f"got {segment.duration}s")
        if segment.sample_rate != ds_conf.sample_rate:
            segment.resample(ds_conf.sample_rate)
        if ds_conf.use_dB_normalization:
            segment.normalize(target_db=ds_conf.target_dB)
        return segment

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def predict(self, audio_data, sample_rate=16000):
        """Single-utterance 192-d embedding."""
        seg = self._load_audio(audio_data, sample_rate)
        return self.predict_batch([seg.samples])[0]

    def predict_batch(self, audios_data, sample_rate=16000, batch_size=32):
        """Batched embeddings with bucketed padding + on-device masking
        (reference ``predict.py:235-269`` pads to the longest)."""
        samples = []
        for audio in audios_data:
            if isinstance(audio, np.ndarray) and audio.dtype == np.float32:
                samples.append(audio)
            else:
                samples.append(self._load_audio(audio, sample_rate).samples)
        features = []
        for i in range(0, len(samples), batch_size):
            chunk = samples[i:i + batch_size]
            max_len = bucket_length(max(len(s) for s in chunk))
            # batch size snaps to a power-of-two bucket: a ragged final
            # chunk must not mint a fresh compiled program per count
            # (kernel compiles are minutes), while a single-clip predict
            # still runs at batch 1; padding rows are discarded below
            b_real = len(chunk)
            # data-parallel serving: shard chunks with >= 1 clip per
            # device over the mesh; smaller chunks (e.g. single-clip
            # ``predict``) stay on one device where the Pallas fast
            # path wins
            n_dev = (self._mesh.devices.size
                     if self._mesh is not None else 1)
            use_dp = n_dev > 1 and b_real >= n_dev
            b_pad = n_dev if use_dp else 1
            while b_pad < b_real:
                b_pad *= 2
            waves = np.zeros((b_pad, max_len), np.float32)
            ratios = np.ones((b_pad,), np.float32)
            for j, s in enumerate(chunk):
                waves[j, :len(s)] = s
                ratios[j] = len(s) / max_len
            ratios_valid = ratios[:b_real]
            if use_dp:
                # sharded kernel path first (same VMEM bucket cap as the
                # single-device fast path — per-device shapes are local)
                if (self._embed_fast_sharded is not None
                        and max_len <= self._FAST_PATH_MAX_SAMPLES):
                    try:
                        emb = self._embed_fast_sharded(waves, ratios)
                        features.append(np.asarray(emb)[:b_real])
                        continue
                    except Exception as e:  # pragma: no cover - device-only
                        logger.warning(
                            f"sharded Pallas fast path failed ({e!r}); "
                            "falling back to the XLA path for this process")
                        self._embed_fast_sharded = None
                from .parallel.mesh import shard_batch
                waves_s, ratios_s = shard_batch((waves, ratios),
                                                self._mesh)
                emb = self._jit_embed(waves_s, ratios_s)
                features.append(np.asarray(emb)[:b_real])
                continue
            # VMEM bounds the trunk kernel's row blocks (~2k rows/step at
            # u=1 = ~40 s buckets); rarer longer audio stays on XLA
            fast_ok = (self._embed_fast is not None
                       and max_len <= self._FAST_PATH_MAX_SAMPLES)
            emb = None
            if fast_ok:
                try:
                    if bool(np.all(ratios_valid == 1.0)):
                        # exact-length batch (e.g. equal diarization
                        # chunks): Pallas kernels, no padding mask needed
                        emb = self._embed_fast(jnp.asarray(waves))
                    else:
                        # padded bucket: per-utterance pooling weights /
                        # masks are kernel inputs — same compiled program
                        # for any mix of lengths within the bucket
                        emb = self._embed_fast_masked(waves, ratios)
                except Exception as e:  # pragma: no cover - device-only
                    # a kernel that fails to compile/run on this part must
                    # not take serving down — disable and fall back to XLA
                    logger.warning(
                        f"Pallas fast path failed ({e!r}); falling back "
                        "to the XLA embed path for this process")
                    self._embed_fast = None
            if emb is None:
                emb = self._jit_embed(jnp.asarray(waves),
                                      jnp.asarray(ratios))
            features.append(np.asarray(emb)[:b_real])
        return np.concatenate(features, axis=0)

    def contrast(self, audio_data1, audio_data2):
        """1:1 cosine similarity (reference ``predict.py:271-283``)."""
        f1 = self.predict(audio_data1)
        f2 = self.predict(audio_data2)
        return self.cosine_score(f1, f2)

    def register(self, audio_data, user_name: str, sample_rate=16000):
        """Add a voiceprint: writes ``audio_db/<user>/N.wav``, updates the
        pickle index + per-user mean (reference ``predict.py:285-322``)."""
        if (not user_name or ".." in user_name
                or any(c in user_name for c in ("/", "\\", "\x00"))):
            # the name becomes a directory under audio_db — never let it
            # traverse outside (serving front-ends pass client input here)
            return False, f"invalid user name: {user_name!r}"
        seg = self._load_audio(audio_data, sample_rate)
        feature = self.predict(seg)
        self.audio_feature = (feature[None] if self.audio_feature is None
                              else np.vstack((self.audio_feature,
                                              feature[None])))
        user_dir = os.path.join(self.audio_db_path, user_name)
        n = len(os.listdir(user_dir)) if os.path.exists(user_dir) else 0
        audio_path = os.path.join(user_dir, f"{n}.wav")
        os.makedirs(user_dir, exist_ok=True)
        seg.to_wav_file(audio_path)
        self.users_audio_path.append(audio_path.replace("\\", "/"))
        self.users_name.append(user_name)
        self.__write_index()
        if user_name in self.users_name_mean:
            idx = self.users_name_mean.index(user_name)
            rows = [i for i, v in enumerate(self.users_name)
                    if v == user_name]
            self.audio_feature_mean[idx] = \
                self.audio_feature[rows].mean(axis=0)
        else:
            self.users_name_mean.append(user_name)
            self.audio_feature_mean = (
                feature[None] if self.audio_feature_mean is None
                else np.vstack((self.audio_feature_mean, feature[None])))
        return True, "register success"

    def recognition(self, audio_data, threshold=None, sample_rate=16000):
        """1:N retrieval; returns [name, score] or [None, None]
        (reference ``predict.py:324-335``)."""
        if threshold:
            self.threshold = threshold
        feature = self.predict(audio_data, sample_rate=sample_rate)
        return self.__retrieval(feature[None])[0]

    def get_users(self):
        return self.users_name

    def remove_user(self, user_name):
        """Delete a user's rows, files and mean voiceprint
        (reference ``predict.py:344-364``)."""
        if user_name not in self.users_name:
            return False
        for index in sorted((i for i, n in enumerate(self.users_name)
                             if n == user_name), reverse=True):
            del self.users_name[index]
            del self.users_audio_path[index]
            self.audio_feature = np.delete(self.audio_feature, index, axis=0)
        self.__write_index()
        shutil.rmtree(os.path.join(self.audio_db_path, user_name),
                      ignore_errors=True)
        idx = self.users_name_mean.index(user_name)
        del self.users_name_mean[idx]
        self.audio_feature_mean = np.delete(self.audio_feature_mean, idx,
                                            axis=0)
        return True

    def speaker_diarization(self, audio_data, sample_rate=16000,
                            speaker_num=None, search_audio_db=False,
                            threshold=None):
        """VAD → chunk → batched embed → cluster → postprocess
        (reference ``predict.py:366-396``). ``threshold`` overrides
        ``self.threshold`` for the audio-db speaker naming only."""
        seg = self._load_audio(audio_data, sample_rate)
        segments = self.speaker_diarize.segments_audio(seg)
        chunk_data = [s[2] for s in segments]
        features = self.predict_batch(chunk_data, sample_rate=sample_rate)
        labels, centers = self.speaker_diarize.clustering(
            features, speaker_num=speaker_num)
        outputs = self.speaker_diarize.postprocess(segments, labels)
        if search_audio_db:
            assert self.audio_feature is not None, \
                "voiceprint database is empty; register speakers first"
            names = self.__retrieval(centers, threshold=threshold)
            outputs = [{
                "speaker": (names[o["speaker"]][0]
                            or f"stranger{o['speaker']}"),
                "start": o["start"], "end": o["end"],
            } for o in outputs]
        return outputs


# reference-compatible alias
PPVectorPredictor = Predictor
