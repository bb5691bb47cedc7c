#!/bin/bash
# One-shot round-3 device measurement sweep (run serially on the chip —
# never share the TPU between processes; see ROADMAP methodology notes).
#
#   bash tools/r3_measure.sh 2>&1 | tee /tmp/r3_measure.log
set -x
cd "$(dirname "$0")/.."

# 1. FCM kernel vs XLA FCM: hot path (b256 x 3 s) + chunked long bucket
timeout 2400 python tools/fcm_kernel_bench.py 256 3 50
timeout 2400 python tools/fcm_kernel_bench.py 16 20 20

# 1b. SDConv op numerics on device (fwd + all grads, both strides)

# 2. CAM++ train step: SDConv Pallas convs vs lax (bf16 AMP b256)

# 3. the driver benchmark (also warms .jax_cache for the round-end run)
timeout 3600 python bench.py

# 4. device traces for the segment tables (embed path + train step)
timeout 2400 python tools/trace_embed.py 3 256 5 /tmp/trace_embed_r3
timeout 2400 python tools/trace_train.py CAMPPlus 256 1 /tmp/trace_train_r3
