"""Benchmark: 16 kHz wav → on-device Fbank (Pallas) → CAM++ → 192-d
embedding, utterances/sec on one chip (the BASELINE.json north-star
metric).

Methodology: ITERS iterations are chained *inside one jitted fori_loop*
(each iteration's input depends on the previous output), so the timing is
strictly device-serial — async dispatch, RPC pipelining, or runtime
caching of identical executions cannot inflate it. Synchronisation is a
host transfer of a scalar derived from the result (``block_until_ready``
can be a no-op over tunneled TPU transports). Sanity bound: XLA cost
analysis puts this program at 3.37 GFLOP and ~63 MB of HBM traffic per
utterance — it is HBM-bandwidth-bound, so utt/s cannot exceed
(HBM GB/s) / 0.063.

Baseline: the reference logs ~440–480 data/sec for GPU *training*
(reference README.md:354-360); no published inference number exists, so
``vs_baseline`` is value / 480.

Prints one JSON line.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: repeat runs (e.g. the driver) skip the
# multi-minute CAM++ compile
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

BATCH = 256
SECONDS = 3
SR = 16000
ITERS = 20
BASELINE_UTT_PER_SEC = 480.0


def main():
    from voiceprintrecognition_paddlepaddle_tpu.models import CAMPPlus
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        compute_feature)

    model = CAMPPlus(input_size=80, embd_dim=192, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(BATCH, SR * SECONDS).astype(np.float32) * 0.1)

    feats0 = compute_feature(waves[:2], "Fbank", sr=SR, n_mels=80)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), feats0, train=False))()

    def embed_once(w):
        feats = compute_feature(w, "Fbank", sr=SR, n_mels=80)
        return model.apply(variables, feats, train=False)

    @jax.jit
    def embed_chained(w):
        def body(i, carry):
            w2, _ = carry
            emb = embed_once(w2)
            # data dependency: next input derives from this output
            return (w2 * (1.0 + emb[0, 0].astype(jnp.float32) * 1e-12), emb)

        _, emb = jax.lax.fori_loop(
            0, ITERS, body,
            (w, jnp.zeros((w.shape[0], 192), jnp.bfloat16)))
        return emb

    def _sync(x):
        return float(np.asarray(jnp.sum(x[:1])))  # host transfer = real sync

    _sync(embed_chained(waves))  # compile + warm
    t0 = time.perf_counter()
    _sync(embed_chained(waves))
    elapsed = (time.perf_counter() - t0) / ITERS

    utt_per_sec = BATCH / elapsed
    print(json.dumps({
        "metric": "wav_to_campplus_embedding_throughput",
        "value": round(utt_per_sec, 2),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
