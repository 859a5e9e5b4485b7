#!/bin/bash
# Round-6 study queue (r5 verdict items 1, 3, 4, 6) — run via tmux, sequential.
set -x
cd /root/repo
export EGS_SCALE_ITERS=3
export EGS_SCALE_TIMEOUT=5400
export SPARK_DRIVER_MEMORY=24g

# --- item 1: 4->16 amortization at 1x / 2x / 4x corpus -------------------
EGS_SCALE_PASSES=2 python bench.py --scaling --cores 4,16 \
  > /tmp/scal_416_s1.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6_s1.json
EGS_SCALE_PASSES=1 python bench.py --scaling --cores 4,16 --corpus-scale 2 \
  > /tmp/scal_416_s2.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6_s2.json
rm -rf /dev/shm/egs_bigcorpus_480_2000
SPARK_DRIVER_MEMORY=32g EGS_SCALE_PASSES=1 python bench.py --scaling --cores 4,16 --corpus-scale 4 \
  > /tmp/scal_416_s4.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6_s4.json
rm -rf /dev/shm/egs_bigcorpus_960_2000

# --- item 3: 2->8 north rule with depth-2 comments ------------------------
EGS_SCALE_PASSES=3 python bench.py --scaling --cores 2,8 --depth2 \
  > /tmp/scal_28_d2.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_2_to_8_r6_depth2.json

# --- item 4: purge at scaling-corpus size ---------------------------------
python bench.py --multiround --phases g > /tmp/mr_g.log 2>&1

# --- item 6: ANN recall-vs-cost curve at sf0.1 -----------------------------
python bench.py --ann-curve > /tmp/ann_curve.log 2>&1

echo ALL_R6_STUDIES_DONE
