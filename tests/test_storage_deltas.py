"""Append-only delta commits: O(round) commit cost, merge-on-read patches,
compaction, relocatable manifests."""

import json
import os
import shutil

from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.storage import SnapshotStore


def test_append_mode_unions_deltas(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(0, appends={"t": spark.range(5)})
    store.commit(1, appends={"t": spark.range(5, 8)})
    assert store.load(spark, "t").count() == 8
    # each round wrote only its delta: two separate delta dirs exist
    m = store.manifest()
    assert m["tables"]["t"]["mode"] == "append"
    assert len(m["tables"]["t"]["paths"]) == 2


def test_commit_writes_only_round_delta_files(spark, tmp_path):
    """The scale property itself: round N's write volume is O(delta), not
    O(accumulated table) — asserted on actual bytes on disk."""
    store = SnapshotStore(str(tmp_path / "s"))
    big = spark.range(50_000).withColumn("pad", F.md5(F.col("id").cast("string")))
    store.commit(0, appends={"t": big})

    def _dir_bytes(rel):
        p = os.path.join(store.root, rel)
        return sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(p) for f in fs
        )

    small = spark.range(50_000, 50_010).withColumn(
        "pad", F.md5(F.col("id").cast("string"))
    )
    store.commit(1, appends={"t": small})
    r0, r1 = _dir_bytes("data/t/r000000"), _dir_bytes("data/t/r000001")
    assert store.load(spark, "t").count() == 50_010
    # delta write is a tiny fraction of the base (allow generous parquet
    # per-file overhead: 10 rows must still be way under 10% of 50k rows)
    assert r1 < r0 * 0.1, f"delta commit rewrote too much: r0={r0} r1={r1}"


def test_merge_on_read_patch(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    base = spark.createDataFrame(
        [(1, "a", None), (2, "b", None)], "id long, name string, text string"
    )
    store.commit(0, appends={"t": base})
    patch = spark.createDataFrame([(2, "B-text")], "id long, text string")
    store.commit(1, patches={"t": (patch, ["id"])})
    got = {r.id: (r.name, r.text) for r in store.load(spark, "t").collect()}
    assert got == {1: ("a", None), 2: ("b", "B-text")}
    # column order preserved
    assert store.load(spark, "t").columns == ["id", "name", "text"]


def test_snapshot_mode_replaces(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(0, snapshots={"f": spark.range(10)})
    store.commit(1, snapshots={"f": spark.range(3)})
    assert store.load(spark, "f").count() == 3


def test_compaction_folds_chain_and_patches(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(0, appends={"t": spark.createDataFrame(
        [(1, None)], "id long, text string")})
    store.commit(1, appends={"t": spark.createDataFrame(
        [(2, None)], "id long, text string")})
    store.commit(2, patches={"t": (
        spark.createDataFrame([(1, "x")], "id long, text string"), ["id"])})
    before = {(r.id, r.text) for r in store.load(spark, "t").collect()}
    store.compact(spark, "t")
    m = store.manifest()
    assert len(m["tables"]["t"]["paths"]) == 1
    assert m["tables"]["t"]["patch"]["paths"] == []
    after = {(r.id, r.text) for r in store.load(spark, "t").collect()}
    assert before == after == {(1, "x"), (2, None)}


def test_auto_compaction_bounds_chain(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"), auto_compact_after=3)
    for i in range(6):
        store.commit(i, appends={"t": spark.range(i, i + 1)})
    m = store.manifest()
    assert len(m["tables"]["t"]["paths"]) <= 4  # folded at least once
    assert store.load(spark, "t").count() == 6


def test_manifest_paths_relative_and_store_relocatable(spark, tmp_path):
    src = SnapshotStore(str(tmp_path / "src"))
    src.commit(0, appends={"t": spark.range(7)})
    with open(src._pointer) as f:
        m = json.load(f)
    assert all(not os.path.isabs(p) for p in m["tables"]["t"]["paths"])
    moved = str(tmp_path / "moved")
    shutil.copytree(src.root, moved)
    shutil.rmtree(src.root)  # the original is GONE — no hidden absolute refs
    assert SnapshotStore(moved).load(spark, "t").count() == 7


def test_gc_removes_unreferenced_dirs_only(spark, tmp_path):
    """After compaction + snapshot replacement, gc removes superseded dirs;
    everything the manifest references stays readable."""
    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(0, appends={"t": spark.range(4)}, snapshots={"f": spark.range(2)})
    store.commit(1, appends={"t": spark.range(4, 6)}, snapshots={"f": spark.range(3)})
    store.compact(spark, "t")
    removed = store.gc()
    # superseded: t's two delta dirs (folded into base) + f's round-0 snapshot
    assert sorted(removed) == ["data/f/r000000", "data/t/r000000", "data/t/r000001"]
    assert store.load(spark, "t").count() == 6
    assert store.load(spark, "f").count() == 3
    assert store.gc() == []  # idempotent


def test_maintain_between_rounds_preserves_state(spark, tmp_path):
    """T5 maintenance: compaction + gc between crawl rounds must not change
    any loadable table, and the next round keeps running on the compacted
    store (delta chains restart from the new base)."""
    from eastmoneygubacrawler_spark.engine import CrawlConfig, run_crawl
    from eastmoneygubacrawler_spark.fixtures import FixtureConfig, build_corpus
    from eastmoneygubacrawler_spark.schema import PAGES, ROBOTS, SEEDS

    corpus = build_corpus(FixtureConfig(n_stocks=1, max_count=50, adversarial=False))
    pages = spark.createDataFrame(corpus["pages"], PAGES)
    seeds = spark.createDataFrame(corpus["seeds"], SEEDS)
    robots = spark.createDataFrame(corpus["robots"], ROBOTS)
    store = SnapshotStore(str(tmp_path / "s"))
    cfg = CrawlConfig(n_shards=8, fetch_partitions=4, use_bloom=False, max_depth=1)
    run_crawl(spark, store, pages, seeds, robots, None, cfg)
    run_crawl(spark, store, pages, seeds, robots, None, cfg)

    def snap():
        return {
            t: sorted(map(tuple, store.load(spark, t).collect()))
            for t in ("posts", "seen")
        }

    before = snap()
    report = store.maintain(spark)
    assert "posts" in report["compacted"] or "seen" in report["compacted"]
    assert report["gc"]  # something was expired
    assert snap() == before
    # a further round still works on the maintained store
    run_crawl(spark, store, pages, seeds, robots, None, cfg)
    assert snap() == before  # recrawl adds nothing on a static corpus


def test_legacy_manifest_migration(spark, tmp_path):
    """A format-1 manifest (snapshot entries as bare path strings, no format
    field) is migrated on read instead of crashing with a TypeError."""
    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(0, snapshots={"f": spark.range(4)})
    with open(store._pointer) as f:
        m = json.load(f)
    legacy = {
        "round": m["round"],
        "tables": {"f": m["tables"]["f"]["paths"][0]},  # pre-diff format
        "committed_at": m["committed_at"],
    }
    with open(store._pointer, "w") as f:
        json.dump(legacy, f)
    assert store.load(spark, "f").count() == 4
    assert store.manifest()["tables"]["f"]["mode"] == "snapshot"
    # and a commit on top of the migrated store keeps working
    store.commit(1, snapshots={"f": spark.range(2)})
    assert store.load(spark, "f").count() == 2


def test_future_manifest_format_rejected(spark, tmp_path):
    import pytest

    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(0, snapshots={"f": spark.range(1)})
    with open(store._pointer) as f:
        m = json.load(f)
    m["format"] = 99
    with open(store._pointer, "w") as f:
        json.dump(m, f)
    with pytest.raises(RuntimeError, match="format 99"):
        store.manifest()


def test_mode_conflict_guard(spark, tmp_path):
    """Appending to a snapshot table (or snapshotting over an append chain)
    would silently drop data at load — both must raise."""
    import pytest

    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(0, appends={"a": spark.range(3)}, snapshots={"s": spark.range(3)})
    with pytest.raises(ValueError, match="mode='append'"):
        store.commit(1, snapshots={"a": spark.range(1)})
    with pytest.raises(ValueError, match="mode='snapshot'"):
        store.commit(1, appends={"s": spark.range(1)})
    with pytest.raises(ValueError, match="mode='snapshot'"):
        store.commit(1, patches={"s": (spark.range(1), ["id"])})
    # the failed commits left no partial manifest damage
    assert store.load(spark, "a").count() == 3
    assert store.load(spark, "s").count() == 3


def test_meta_rides_manifest_and_merges(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(0, appends={"t": spark.range(3)}, meta={"posts_rows": 3, "x": 1})
    store.commit(1, appends={"t": spark.range(2)}, meta={"posts_rows": 5})
    assert store.meta() == {"posts_rows": 5, "x": 1}  # key-wise merge
    assert SnapshotStore(store.root).meta()["posts_rows"] == 5  # survives reopen


def test_patch_dedup_newest_round_wins(spark, tmp_path):
    """Belt-and-braces for the ≤1-patch-per-key contract: a double-patched
    key must not duplicate base rows; the newest round's patch wins."""
    store = SnapshotStore(str(tmp_path / "s"))
    base = spark.createDataFrame(
        [(1, None), (2, None)], "id long, text string"
    )
    store.commit(0, appends={"t": base})
    store.commit(1, patches={"t": (
        spark.createDataFrame([(1, "old")], "id long, text string"), ["id"])})
    store.commit(2, patches={"t": (
        spark.createDataFrame([(1, "new"), (2, "b")], "id long, text string"),
        ["id"])})
    rows = store.load(spark, "t").collect()
    assert len(rows) == 2  # no duplication through the patch join
    got = {r.id: r.text for r in rows}
    assert got == {1: "new", 2: "b"}


def test_maintain_reconciles_posts_rows_drift(spark, tmp_path):
    """crawl_seq trusts meta['posts_rows']; rows appended to posts OUTSIDE
    run_crawl would silently shift it forever.  maintain() (which already
    scans tables to compact) must detect the drift, repair the counter, and
    report it; a consistent store reconciles to {}."""
    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(0, appends={"posts": spark.range(10)}, meta={"posts_rows": 10})
    assert store.maintain(spark)["reconciled"] == {}

    # a rogue append that bypasses the engine's counter bookkeeping
    store.commit(1, appends={"posts": spark.range(10, 17)})
    out = store.maintain(spark)
    assert out["reconciled"] == {"posts_rows": {"was": 10, "now": 17}}
    assert store.meta()["posts_rows"] == 17
    # repaired: a second pass is clean
    assert store.maintain(spark)["reconciled"] == {}


def test_maintain_reconcile_skips_legacy_store(spark, tmp_path):
    """No posts_rows in meta (legacy store) ⇒ nothing to reconcile; the
    engine's scan fallback covers crawl_seq there."""
    store = SnapshotStore(str(tmp_path / "s"))
    store.commit(0, appends={"posts": spark.range(5)})
    assert store.maintain(spark)["reconciled"] == {}
