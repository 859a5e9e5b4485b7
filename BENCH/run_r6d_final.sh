#!/bin/bash
# Round-6 final queue: runs AFTER the r6c fetch-strategy adjudication, on the
# adjudicated default engine (pass EGS_BOUNDED_BC through the environment if
# the default flips; unset means the engine default, bounded-broadcast).
#   1. 2->8 north-rule re-hold with depth-2 comments on the final engine
#      (the 0.855 artifact predates the bounded-broadcast list fetch).
#   2. Noise-robust headline bench (median-of-3 + triad probe).
#   3. Full test suite, which has not yet run this round.
set -x
cd /root/repo
export EGS_SCALE_TIMEOUT=5400
export SPARK_DRIVER_MEMORY=24g

EGS_SCALE_PASSES=3 EGS_SCALE_ITERS=2 python bench.py --scaling --cores 2,8 --depth2 \
  > /tmp/scal_28_d2_r6d.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_2_to_8_r6b_depth2.json

python bench.py > /tmp/headline_r6.log 2>&1

python -m pytest tests/ -q > /tmp/suite_r6.log 2>&1
tail -3 /tmp/suite_r6.log

echo ALL_R6D_DONE
