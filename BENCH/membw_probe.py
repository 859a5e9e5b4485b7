"""Memory-bandwidth saturation probe (STREAM-triad style).

Evidence for the 4→16-core scaling analysis in BASELINE.md §4: if this box's
AGGREGATE achievable memory bandwidth at 16 pinned cores is much less than
4× the 4-core figure, then any memory-bound stage (shuffle serialization,
parquet encode, Arrow transfer) CANNOT scale 4× on this box no matter how the
engine partitions — the bottleneck is the shared memory subsystem, a resource
a real cluster scales with executor count (each executor brings its own
memory buses).

Method: N processes, each pinned to its own core (sched_setaffinity), each
running the STREAM triad a[:] = b + s*c over arrays far larger than LLC,
barrier-synchronized start.  Reports per-level aggregate GB/s (3 arrays × 8
bytes moved per element per iteration).

Run: python BENCH/membw_probe.py            # writes BENCH/membw.json
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

N_ELEM = 1 << 25  # 256 MB per array, 3 arrays per worker — LLC is ~tens of MB
ITERS = 8


def _worker(core: int, barrier, out):
    os.sched_setaffinity(0, {core})
    import numpy as np

    b = np.random.default_rng(core).standard_normal(N_ELEM)
    c = np.random.default_rng(core + 1).standard_normal(N_ELEM)
    a = np.empty_like(b)
    np.multiply(c, 1.1, out=a)  # touch pages
    barrier.wait()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)
    dt = time.perf_counter() - t0
    # triad moves ~4 arrays/iter here (c read, a write, a read+b read, a write)
    gb = 4 * 8 * N_ELEM * ITERS / 1e9
    out.put(gb / dt)


def measure(n_cores: int) -> float:
    barrier = mp.Barrier(n_cores)
    out: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(i, barrier, out)) for i in range(n_cores)
    ]
    for p in procs:
        p.start()
    vals = [out.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(vals)


if __name__ == "__main__":
    results = {}
    reps = int(os.environ.get("MEMBW_REPS", "3"))
    for n in (1, 2, 4, 8, 16):
        # best-of-reps: this VM shows heavy neighbor interference (an 8-core
        # pass once read BELOW the 2-core pass); contention only ever lowers
        # achievable bandwidth, so max over repetitions estimates the ceiling
        results[f"aggregate_gb_s_{n}_cores"] = round(
            max(measure(n) for _ in range(reps)), 2
        )
    r2 = results["aggregate_gb_s_2_cores"]
    r4 = results["aggregate_gb_s_4_cores"]
    r8 = results["aggregate_gb_s_8_cores"]
    r16 = results["aggregate_gb_s_16_cores"]
    # both north-rule spans: the hardware's own N→4N bandwidth scaling is
    # the ceiling for any memory-bound phase at that span
    results["bw_scaling_2_to_8"] = round(r8 / (4 * r2), 3)
    results["bw_scaling_4_to_16"] = round(r16 / (4 * r4), 3)
    print(json.dumps(results))
    with open(os.path.join(os.path.dirname(__file__), "membw.json"), "w") as f:
        json.dump(results, f, indent=2)
