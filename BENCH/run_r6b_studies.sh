#!/bin/bash
# Round-6 second study queue: re-measure the 4->16 amortization curve and the
# 2->8 north rule on the bounded-broadcast-fetch engine (commit f1878f6).
set -x
cd /root/repo
export EGS_SCALE_ITERS=3
export EGS_SCALE_TIMEOUT=5400
export SPARK_DRIVER_MEMORY=24g

EGS_SCALE_PASSES=2 python bench.py --scaling --cores 4,16 \
  > /tmp/scal_416_r6b_s1.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6b_s1.json
EGS_SCALE_PASSES=1 python bench.py --scaling --cores 4,16 --corpus-scale 2 \
  > /tmp/scal_416_r6b_s2.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6b_s2.json
SPARK_DRIVER_MEMORY=32g EGS_SCALE_PASSES=1 python bench.py --scaling --cores 4,16 --corpus-scale 4 \
  > /tmp/scal_416_r6b_s4.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6b_s4.json
rm -rf /dev/shm/egs_bigcorpus_960_2000

EGS_SCALE_PASSES=3 python bench.py --scaling --cores 2,8 --depth2 \
  > /tmp/scal_28_r6b_d2.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_2_to_8_r6b_depth2.json

echo ALL_R6B_STUDIES_DONE
