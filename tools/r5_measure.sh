#!/bin/bash
# Round-5 device measurement sweep (run serially on the chip — never
# share the TPU between processes). Ordered by value so a mid-sweep
# tunnel death still leaves the most important numbers on disk. Every
# number cited in ROADMAP.md's round-5 sections comes from one of these.
#
#   bash tools/r5_measure.sh 2>&1 | tee /tmp/r5_measure.log
set -x
cd "$(dirname "$0")/.."

# 1. the hardened driver benchmark (fresh numbers + warms .jax_cache)
timeout 3300 python bench.py

# 2. CMN-fold A/B (ROADMAP "Measured decisions"): the tool and the
#    losing folded path were deleted together at commit f3b590b — to
#    reproduce the A/B, check out its PARENT (git checkout f3b590b~1)
#    and run `python tools/fbank_cmn_bench.py 256 3 50` there.

# 3. train-step roofline: XLA cost analysis off the compiled step vs
#    measured step time (ROADMAP "Roofline (train)")
timeout 1800 python tools/roofline_train.py CAMPPlus 256 1
timeout 1800 python tools/roofline_train.py EcapaTdnn 64 0

# 4. achievable HBM bandwidth (the roofline's denominator)
timeout 1200 python tools/hbm_bw_probe.py

# 5. FCM hot-path floor analysis (ROADMAP "FCM hot-path floor
#    analysis"): per-conv XLA vs padded-im2col vs packed-reformulation
#    matmul floors + relayout costs
timeout 5400 python tools/fcm_floor_bench.py 256 3.0 50

# 6. trunk-kernel steady state (this tool's measurement with
#    VPR_TRUNK_UNIFORM_GATES=1 at the variant's last commit is what
#    killed the uniform-gates variant: 95.26 ms/batch vs ~4.6 ms —
#    ROADMAP "Measured decisions"; on HEAD it benches the production
#    kernel)
timeout 3600 python tools/ug_steady_bench.py 3.0 256
