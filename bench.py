"""Benchmark: 16 kHz wav → on-device Fbank → CAM++ → 192-d embedding,
utterances/sec on one chip (the BASELINE.json north-star metric).

Baseline: the reference logs ~440–480 data/sec for GPU *training*
(reference README.md:354-360); no published inference number exists, so
``vs_baseline`` is value / 480 — conservative, since training throughput
overstates the reference's inference cost ceiling per utterance.

Prints one JSON line.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
SECONDS = 3
SR = 16000
WARMUP = 5
ITERS = 30
BASELINE_UTT_PER_SEC = 480.0


def main():
    from voiceprintrecognition_paddlepaddle_tpu.models import CAMPPlus
    from voiceprintrecognition_paddlepaddle_tpu.ops.features import (
        compute_feature)

    model = CAMPPlus(input_size=80, embd_dim=192, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    waves = jnp.asarray(rng.randn(BATCH, SR * SECONDS).astype(np.float32) * 0.1)

    feats0 = compute_feature(waves, "Fbank", sr=SR, n_mels=80)
    variables = model.init(jax.random.PRNGKey(0), feats0, train=False)

    @jax.jit
    def embed(variables, waves):
        feats = compute_feature(waves, "Fbank", sr=SR, n_mels=80)
        return model.apply(variables, feats, train=False)

    for _ in range(WARMUP):
        embed(variables, waves).block_until_ready()
    start = time.perf_counter()
    for _ in range(ITERS):
        out = embed(variables, waves)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    utt_per_sec = BATCH * ITERS / elapsed
    print(json.dumps({
        "metric": "wav_to_campplus_embedding_throughput",
        "value": round(utt_per_sec, 2),
        "unit": "utt/s/chip",
        "vs_baseline": round(utt_per_sec / BASELINE_UTT_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
