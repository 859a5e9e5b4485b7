#!/bin/bash
# Round-7 fetch-strategy adjudication (r6 verdict item 1): same-window ABAB
# at the 4x corpus, 16 cores (the level where the r6b single-passes
# inverted).  Arms:
#   bc1  = forced bounded-broadcast (the r6 shipped default; cap disabled)
#   bc0  = all-SMJ wave fetch (EGS_BOUNDED_BC=0, the round-5 path)
#   auto = the new size-aware default (cap 500k rows -> the 1.7M-row wave
#          falls back to SMJ)
# Interleaved bc1/bc0/bc1/bc0 then auto, each best-of-EGS_SCALE_ITERS in its
# own pinned JVM; results land in BENCH/fetch_abab_r7_<arm><pass>.log and a
# summary JSON.
set -x
cd /root/repo
export EGS_SCALE_TIMEOUT=5400
export SPARK_DRIVER_MEMORY=24g
export EGS_SCALE_ITERS=${EGS_SCALE_ITERS:-2}

CORPUS=$(python - <<'EOF'
import bench
print(bench._ensure_bigcorpus(960, 2000))
EOF
)
CORPUS=$(echo "$CORPUS" | tail -1)
echo "corpus: $CORPUS"

run_arm () {
  local tag=$1; shift
  taskset -c 0-15 env "$@" python bench.py --scaling-worker 16 "$CORPUS" \
    > "/tmp/abab_r7_${tag}.log" 2>&1
  grep "SCALING_RESULT" "/tmp/abab_r7_${tag}.log" | tail -1
}

run_arm bc1_p1 EGS_BOUNDED_BC=1 EGS_BOUNDED_BC_MAX_ROWS=1000000000
run_arm bc0_p1 EGS_BOUNDED_BC=0
run_arm bc1_p2 EGS_BOUNDED_BC=1 EGS_BOUNDED_BC_MAX_ROWS=1000000000
run_arm bc0_p2 EGS_BOUNDED_BC=0
run_arm auto_p1 EGS_BOUNDED_BC=1

python - <<'EOF'
import json, glob, os
out = {"corpus": "bigcorpus_960_2000 (4x, 5.8M urls)", "cores": 16,
       "iters": int(os.environ.get("EGS_SCALE_ITERS", "2")), "arms": {}}
for log in sorted(glob.glob("/tmp/abab_r7_*.log")):
    tag = log.split("abab_r7_")[1].removesuffix(".log")
    best = None
    for ln in open(log, errors="replace"):
        if ln.startswith("SCALING_RESULT "):
            best = json.loads(ln.removeprefix("SCALING_RESULT "))
    if best is None:
        out["arms"][tag] = "FAILED"
        continue
    out["arms"][tag] = {
        "wall_s": round(best["wall_s"], 2),
        "thpt_urls_per_s": round(best["throughput_urls_per_s"], 1),
        "phases": best["phases"],
    }
with open("BENCH/fetch_abab_r7.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out, indent=2))
EOF
echo ABAB_R7_DONE
