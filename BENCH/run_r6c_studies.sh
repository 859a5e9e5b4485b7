#!/bin/bash
# Round-6 resume queue (the r6b tmux server died mid-s4 at 09:27).
# Completes the 4->16 amortization curve on the bounded-broadcast engine
# (s4), then A/Bs bounded-broadcast vs legacy-SMJ list fetch back-to-back
# in ONE VM window at the 4x and 1x corpus points — r6b s1 (0.58) read
# below the old-engine s1b (0.682) but 5h apart on a box that drifts 20%+,
# so only a same-window alternation can adjudicate the strategy.
set -x
cd /root/repo
export EGS_SCALE_ITERS=2
export EGS_SCALE_TIMEOUT=5400
export EGS_SCALE_PASSES=1

# --- 4x corpus (5.76M posts, already generated in /dev/shm) ---
SPARK_DRIVER_MEMORY=32g EGS_BOUNDED_BC=1 python bench.py --scaling --cores 4,16 --corpus-scale 4 \
  > /tmp/scal_416_r6c_s4_bc1.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6b_s4.json
SPARK_DRIVER_MEMORY=32g EGS_BOUNDED_BC=0 python bench.py --scaling --cores 4,16 --corpus-scale 4 \
  > /tmp/scal_416_r6c_s4_bc0.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6b_s4_smj.json
rm -rf /dev/shm/egs_bigcorpus_960_2000

# --- 1x corpus ABAB (same-window strategy A/B at the level where r6b read low) ---
SPARK_DRIVER_MEMORY=24g EGS_BOUNDED_BC=1 python bench.py --scaling --cores 4,16 \
  > /tmp/scal_416_r6c_ab1_bc1.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6c_bc1_p1.json
SPARK_DRIVER_MEMORY=24g EGS_BOUNDED_BC=0 python bench.py --scaling --cores 4,16 \
  > /tmp/scal_416_r6c_ab1_bc0.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6c_bc0_p1.json
SPARK_DRIVER_MEMORY=24g EGS_BOUNDED_BC=1 python bench.py --scaling --cores 4,16 \
  > /tmp/scal_416_r6c_ab2_bc1.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6c_bc1_p2.json
SPARK_DRIVER_MEMORY=24g EGS_BOUNDED_BC=0 python bench.py --scaling --cores 4,16 \
  > /tmp/scal_416_r6c_ab2_bc0.log 2>&1 \
  && cp BENCH/scaling_last.json BENCH/scaling_4_to_16_r6c_bc0_p2.json

echo ALL_R6C_STUDIES_DONE
