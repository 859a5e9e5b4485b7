"""Politeness under host diversity (r5 verdict item 8).

The fixture and scaling corpora are single-host-dominant by design (P8
salting is the star there); these tests pin the per-host budget semantics
when the frontier spans MANY hosts with a Zipf-shaped URL distribution —
the Common-Crawl regime the north rule targets.  The matching cost study
(`python bench.py --politeness-hosts`) measures that the one-window-pass
split stays flat as hosts go 1 → 10^4 at constant row count.
"""

from pyspark.sql import functions as F

from eastmoneygubacrawler_spark.operators.frontier import politeness_split


def _zipf_frontier(spark, n_rows: int, n_hosts: int):
    """Deterministic Zipf-ish frontier: host = floor(H^u) for u uniform in
    [0,1) → log-uniform host ids, so host 1 dominates like a real crawl
    frontier while the tail spans all ids."""
    u = (F.pmod(F.xxhash64(F.col("id")), F.lit(10_000)) / 10_000.0)
    return (
        spark.range(n_rows)
        .withColumn(
            "host",
            F.concat(
                F.lit("h"),
                F.floor(F.pow(F.lit(float(n_hosts)), u)).cast("string"),
            ),
        )
        .withColumn("url", F.concat(F.col("host"), F.lit("/u"), F.col("id")))
        .withColumn("host_rank", F.lit(0))
        .withColumn("page", (F.col("id") % 97).cast("int"))
        .withColumn("item_seq", F.col("id").cast("int"))
        .drop("id")
    )


def test_budget_exact_partition_many_hosts(spark):
    pending = _zipf_frontier(spark, 50_000, 10_000).localCheckpoint(eager=True)
    budget = 3
    sched, over = politeness_split(pending, budget)

    per_host = {r.host: r.n for r in pending.groupBy("host").count()
                .withColumnRenamed("count", "n").collect()}
    sched_per_host = {r.host: r.n for r in sched.groupBy("host").count()
                      .withColumnRenamed("count", "n").collect()}
    # budget enforced exactly for every host, dominant or tail
    for h, n in per_host.items():
        assert sched_per_host.get(h, 0) == min(n, budget), h
    # the split is an exact partition of pending
    assert sched.count() + over.count() == pending.count()
    assert sched.join(over, on="url", how="inner").count() == 0
    both = sched.unionByName(over)
    assert both.exceptAll(pending).count() == 0
    assert pending.exceptAll(both).count() == 0


def test_budget_scheduled_rows_are_canonical_prefix(spark):
    """The scheduled rows must be the FIRST ``budget`` rows per host in
    canonical (host_rank, type_rank, page, item_seq) order — the priority
    queue semantics, not an arbitrary per-host sample."""
    pending = _zipf_frontier(spark, 20_000, 100).localCheckpoint(eager=True)
    budget = 5
    sched, _ = politeness_split(pending, budget)
    got = {}
    for r in sched.collect():
        got.setdefault(r.host, []).append((r.page, r.item_seq))
    exp = {}
    for r in pending.collect():
        exp.setdefault(r.host, []).append((r.page, r.item_seq))
    for h, rows in exp.items():
        assert sorted(got[h]) == sorted(rows)[: min(budget, len(rows))], h


def test_host_budget_overrides_with_many_hosts(spark):
    pending = _zipf_frontier(spark, 20_000, 1_000).localCheckpoint(eager=True)
    overrides = spark.createDataFrame(
        [("h1", 10), ("h2", 0), ("h7", 1)], ["host", "budget"]
    )
    sched, over = politeness_split(pending, 2, host_budgets=overrides)
    per_host = {r.host: r.n for r in pending.groupBy("host").count()
                .withColumnRenamed("count", "n").collect()}
    sched_per_host = {r.host: r.n for r in sched.groupBy("host").count()
                      .withColumnRenamed("count", "n").collect()}
    caps = {"h1": 10, "h2": 0, "h7": 1}
    for h, n in per_host.items():
        assert sched_per_host.get(h, 0) == min(n, caps.get(h, 2)), h
    assert sched.count() + over.count() == pending.count()


def test_salted_split_equals_plain(spark):
    """The salted two-phase rank must produce byte-identical halves to the
    plain one-window path (the order key is unique per host here, as in the
    engine): distributed top-k pruning is lossless."""
    pending = _zipf_frontier(spark, 30_000, 50).localCheckpoint(eager=True)
    for budget, overrides in (
        (7, None),
        (3, [("h1", 20), ("h3", 0)]),
    ):
        hb = (
            spark.createDataFrame(overrides, ["host", "budget"])
            if overrides else None
        )
        s_plain, o_plain = politeness_split(pending, budget, host_budgets=hb)
        s_salt, o_salt = politeness_split(
            pending, budget, host_budgets=hb, n_salts=16
        )
        assert s_plain.exceptAll(s_salt).count() == 0
        assert s_salt.exceptAll(s_plain).count() == 0
        assert o_plain.exceptAll(o_salt).count() == 0
        assert o_salt.exceptAll(o_plain).count() == 0
        assert s_salt.columns == s_plain.columns


def test_salted_split_single_host_parallelizes(spark):
    """On a single-host frontier the salted path's big sort runs in parallel
    (host, salt) partitions — the plan must show the local window keyed by
    both columns, and results must still be the exact budget prefix."""
    pending = _zipf_frontier(spark, 40_000, 1).localCheckpoint(eager=True)
    sched, over = politeness_split(pending, 9, n_salts=8)
    assert sched.count() == 9
    assert over.count() == 40_000 - 9
    got = sorted((r.page, r.item_seq) for r in sched.collect())
    exp = sorted((r.page, r.item_seq) for r in pending.collect())[:9]
    assert got == exp


def test_unbounded_default_with_partial_budget_table(spark):
    """r7 fast path (ADVICE r6): with a politeness table present and the
    default budget unbounded, hosts ABSENT from the table are scheduled
    outright (no window funnel) while tabled hosts still rank against
    their finite caps — the split must equal the semantic definition:
    first `budget` rows per tabled host in canonical order, everything
    else of those hosts over budget, untabled hosts fully scheduled."""
    pending = _zipf_frontier(spark, 5_000, 20)
    budgets = spark.createDataFrame(
        [("h1", 7), ("h2", 3)], "host string, budget long"
    )
    sched, over = politeness_split(
        pending, 1_000_000_000, host_budgets=budgets
    )
    got_sched = {r.url for r in sched.collect()}
    got_over = {r.url for r in over.collect()}
    rows = sorted(
        pending.collect(), key=lambda r: (r.host_rank, r.page, r.item_seq, r.url)
    )
    caps = {"h1": 7, "h2": 3}
    seen: dict = {}
    exp_sched, exp_over = set(), set()
    for r in rows:
        cap = caps.get(r.host)
        if cap is None:
            exp_sched.add(r.url)
            continue
        seen[r.host] = seen.get(r.host, 0) + 1
        (exp_sched if seen[r.host] <= cap else exp_over).add(r.url)
    assert got_sched == exp_sched
    assert got_over == exp_over and len(got_over) > 0
