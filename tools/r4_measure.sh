#!/bin/bash
# Round-4 device measurement sweep (run serially on the chip — never
# share the TPU between processes). Ordered by value so a mid-sweep
# tunnel death still leaves the most important numbers on disk.
#
#   bash tools/r4_measure.sh 2>&1 | tee /tmp/r4_measure.log
set -x
cd "$(dirname "$0")/.."

# 1. the hardened driver benchmark (fresh numbers + warms .jax_cache)
timeout 3300 python bench.py

# 2. FCM kernel vs XLA FCM: hot path (b256 x 3 s) + chunked long bucket
timeout 1800 python tools/fcm_kernel_bench.py 256 3 50
timeout 1800 python tools/fcm_kernel_bench.py 16 20 20



# 3. CAM++ train step (bf16 AMP b256)
timeout 1800 python tools/train_bench.py CAMPPlus 256 1

# 4. device traces for the segment tables (embed path + train step)
timeout 1800 python tools/trace_embed.py 3 256 5 /tmp/trace_embed_r4
timeout 1800 python tools/trace_train.py CAMPPlus 256 1 /tmp/trace_train_r4
