"""Profile the list_fetch_parse phase at scaling-corpus size (round 6).

The 4x amortization study (scaling_4_to_16_r6_s4.json) showed the phase's
wall nearly core-count-independent (77.1 s @4c vs 71.9 s @16c) and growing
superlinearly with corpus at 16 cores (9.8 -> 33.4 -> 71.9 s for 1x/2x/4x).
This runs ONE pinned crawl round with the Spark event log on and attributes
the phase's time to stages, printing per-stage wall, task-time, shuffle
bytes, and SPILL bytes so the saturated resource is identified, not guessed.

Run:  taskset -c 0-15 python BENCH/profile_list_phase.py <corpus_dir> [cores]
Then: python BENCH/profile_list_phase.py --parse /tmp/egs_evt_r6/<app>  (auto)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(corpus_dir: str, cores: int = 16) -> str:
    from eastmoneygubacrawler_spark.engine import CrawlConfig, run_crawl
    from eastmoneygubacrawler_spark.session import get_spark
    from eastmoneygubacrawler_spark.storage import SnapshotStore

    evt_dir = "/tmp/egs_evt_r6"
    os.makedirs(evt_dir, exist_ok=True)
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    local_dir = f"{shm}/spark-local-prof"
    os.makedirs(local_dir, exist_ok=True)
    spark = get_spark(
        "egs-profile-list", master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        extra_conf={
            "spark.local.dir": local_dir,
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evt_dir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    seeds = spark.read.parquet(f"{corpus_dir}/seeds.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    tempfile.tempdir = shm
    cfg = CrawlConfig(
        n_shards=64, fetch_partitions=cores * 2, use_bloom=False, max_depth=1,
        broadcast_fetch=os.environ.get("EGS_FETCH_BROADCAST", "0") == "1",
        text_fetch_mode=os.environ.get("EGS_TEXT_FETCH", "join"),
    )
    store_dir = tempfile.mkdtemp(prefix="egs_prof_")
    store = SnapshotStore(store_dir)
    t0 = time.time()
    m = run_crawl(spark, store, pages, seeds, robots, None, cfg)
    print("WALL", round(time.time() - t0, 1), "PHASES", json.dumps(m["phases"]))
    import shutil

    shutil.rmtree(store_dir, ignore_errors=True)
    spark.stop()
    return f"{evt_dir}/{app_id}"


def parse(evt_path: str, top: int = 18) -> None:
    stages = {}
    subs = {}
    t_app = None
    with open(evt_path) as f:
        for line in f:
            try:
                e = json.loads(line)
            except ValueError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerApplicationStart":
                t_app = e.get("Timestamp")
            elif ev == "SparkListenerStageSubmitted":
                si = e["Stage Info"]
                subs[si["Stage ID"]] = si.get("Submission Time", 0)
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                sid = si["Stage ID"]
                t_sub = si.get("Submission Time") or subs.get(sid, 0)
                t_done = si.get("Completion Time", 0)
                # StageCompleted arrives AFTER the TaskEnd events — update in
                # place or the per-task metric aggregates are overwritten
                stages.setdefault(sid, {}).update({
                    "wall_s": round((t_done - t_sub) / 1000, 2),
                    "t_sub_s": round((t_sub - (t_app or t_sub)) / 1000, 1),
                    "name": si.get("Stage Name", "")[:90],
                    "tasks": si.get("Number of Tasks"),
                    "details": (si.get("Details") or "").split("\n")[0][:120],
                })
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                tm = e.get("Task Metrics") or {}
                agg = stages.setdefault(sid, {})
                agg["run_s"] = round(
                    agg.get("run_s", 0) + tm.get("Executor Run Time", 0) / 1000, 1
                )
                agg["cpu_s"] = round(
                    agg.get("cpu_s", 0) + tm.get("Executor CPU Time", 0) / 1e9, 1
                )
                agg["mem_spill_mb"] = round(
                    agg.get("mem_spill_mb", 0)
                    + tm.get("Memory Bytes Spilled", 0) / 1e6, 1
                )
                agg["disk_spill_mb"] = round(
                    agg.get("disk_spill_mb", 0)
                    + tm.get("Disk Bytes Spilled", 0) / 1e6, 1
                )
                sr = tm.get("Shuffle Read Metrics") or {}
                sw = tm.get("Shuffle Write Metrics") or {}
                agg["shuf_read_mb"] = round(
                    agg.get("shuf_read_mb", 0)
                    + (sr.get("Local Bytes Read", 0) + sr.get("Remote Bytes Read", 0))
                    / 1e6, 1,
                )
                agg["shuf_write_mb"] = round(
                    agg.get("shuf_write_mb", 0)
                    + sw.get("Shuffle Bytes Written", 0) / 1e6, 1
                )
                agg["gc_s"] = round(
                    agg.get("gc_s", 0) + tm.get("JVM GC Time", 0) / 1000, 1
                )
    by_wall = sorted(
        ((s.get("wall_s", 0), sid, s) for sid, s in stages.items()), reverse=True
    )
    print(f"{'sid':>5} {'t_sub':>7} {'wall':>7} {'run':>8} {'cpu':>8} {'gc':>6} "
          f"{'shufR MB':>9} {'shufW MB':>9} {'spillM':>8} {'spillD':>8}  name")
    for wall, sid, s in by_wall[:top]:
        print(
            f"{sid:>5} {s.get('t_sub_s', 0):>7} "
            f"{wall:>7} {s.get('run_s', 0):>8} {s.get('cpu_s', 0):>8} "
            f"{s.get('gc_s', 0):>6} {s.get('shuf_read_mb', 0):>9} "
            f"{s.get('shuf_write_mb', 0):>9} {s.get('mem_spill_mb', 0):>8} "
            f"{s.get('disk_spill_mb', 0):>8}  {s.get('name', '')}"
        )


if __name__ == "__main__":
    if "--parse" in sys.argv:
        parse(sys.argv[sys.argv.index("--parse") + 1])
    else:
        corpus = sys.argv[1]
        cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
        path = run(corpus, cores)
        print("EVENTLOG", path)
        parse(path)
