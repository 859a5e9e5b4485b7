"""Frontier scheduling operators: politeness, robots, skew salting, horizon.

The reference guarantees crawl order by executing sequentially (one stock at a
time, pages consumed 1..N — core/scheduler.py:230-245, core/crawler.py:796-801);
we compute the same order *as data* (SURVEY.md §2.6) and let execution be
fully parallel:

    canonical order key = (host_rank, type_rank, page, item_seq)

- ``politeness_schedule``: per-host budgeted selection — the declarative form
  of the reference's inter-host delay + QPS caps (core/scheduler.py:245,
  archive/full_text_CrawlerAsync.py:18-41): rank rows per host by the order
  key and keep rank ≤ budget; budget = round_seconds × qps analog.
- ``salted_repartition``: P8 — break single-dominant-host skew (the entire
  reason the reference maintains a proxy pool, README.md:18-27) by hashing on
  (host, salt) where salt = pmod(xxhash64(url), S).
- ``robots_gate``: new operator (the reference has no robots handling —
  verified, no match for 'robots' in the repo); urllib.robotparser semantics
  in an Arrow-batched pandas UDF, rules joined per host (broadcast).
- ``duplicate_page_horizon``: J4 — the reference's "2 consecutive pages with 0
  new rows ⇒ cancel the rest" (core/crawler.py:829-859) as pure window
  algebra; failed pages don't advance the streak (core/crawler.py:804-808).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

ORDER_KEY = ["host_rank", "type_rank", "page", "item_seq"]


def order_key_cols(df: DataFrame) -> list:
    return [F.col(c).asc_nulls_last() for c in ORDER_KEY if c in df.columns]


def politeness_schedule(
    pending: DataFrame,
    budget_per_host: int,
    host_col: str = "host",
    host_budgets: DataFrame | None = None,
) -> DataFrame:
    """Keep the first ``budget`` rows per host in canonical order.

    ``host_budgets`` (host, budget) overrides the default per host — the
    declarative form of the reference's per-site intervals
    (core/user_agent_config.py:123-135): budget = round_seconds / delay_s.
    The rank is the priority queue; at 10^10 scale the window shuffles by
    host exactly once and AQE splits any skewed host partition.
    """
    return politeness_split(pending, budget_per_host, host_col, host_budgets)[0]


def politeness_split(
    pending: DataFrame,
    budget_per_host: int,
    host_col: str = "host",
    host_budgets: DataFrame | None = None,
    n_salts: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """Partition ``pending`` into (scheduled, unscheduled) by politeness rank.

    Same semantics as ``politeness_schedule`` plus its exact complement —
    the rows over budget that stay pending for the next wave/round.  The
    engine previously derived the complement as
    ``pending LEFT ANTI scheduled`` on url: a full-width sort-merge join
    shuffling BOTH copies of the frontier batch (measured 2-4 s per round on
    the 1.44M-url scaling corpus) just to re-discover which rows one window
    already classified.  Complementary filters over the same ranked frame
    cost one window pass total; with an unbounded budget the complement is
    ``Filter(false)``, which Catalyst's PruneFilters folds to an empty
    LocalRelation — statically free.

    ``n_salts`` > 1 enables the SALTED TWO-PHASE rank for single-host-skewed
    frontiers (the eastmoney regime: one host owns ~all rows, so the plain
    per-host window funnels the whole frontier through one task — measured
    3-6x slower than the many-host case at 1M rows).  Phase 1 ranks within
    (host, salt) — parallel sorts of n/S-row chunks — and keeps each salt's
    local top-cap: any row in a host's global top-cap has < cap predecessors
    globally, hence < cap within its own salt, so the prune is lossless
    (standard distributed top-k).  Phase 2 re-ranks only the <= S*cap
    survivors per host.  Costs one extra (tiny) exchange; callers enable it
    on the once-per-round text/comment budgets where frontiers are large,
    not on the small per-wave list batches where fixed stage latency would
    dominate.  A url tiebreaker makes both phases deterministic when the
    caller's order key has duplicates (the engine's key is unique).
    """
    if host_budgets is None and budget_per_host >= 1_000_000_000:
        # unbounded budget ⇒ the rank is a no-op; skip the per-host window —
        # with one dominant host it would funnel every row through one task
        return pending, pending.filter(F.lit(False))
    keys = order_key_cols(pending)

    def _rank(df: DataFrame, cap, budget_drop: list):
        # the url tiebreaker applies to BOTH the salted and the plain path
        # (ADVICE r6): with duplicate order keys the plain window was
        # nondeterministic across runs and disagreed with the salted form
        tie = [F.col("url").asc()] if "url" in df.columns else []
        if n_salts > 1 and "url" in df.columns:
            w_local = Window.partitionBy(host_col, "_psalt").orderBy(*keys, *tie)
            ranked = df.withColumn(
                "_psalt", F.pmod(F.xxhash64(F.col("url")), F.lit(n_salts)).cast("int")
            ).withColumn("_lr", F.row_number().over(w_local))
            drop = ["_psalt", "_lr", *budget_drop]
            cand = ranked.filter(F.col("_lr") <= cap)
            rest = ranked.filter(F.col("_lr") > cap).drop(*drop)
            w_host = Window.partitionBy(host_col).orderBy(*keys, *tie)
            cand = cand.withColumn("_gr", F.row_number().over(w_host))
            return (
                cand.filter(F.col("_gr") <= cap).drop("_gr", *drop),
                rest.unionByName(cand.filter(F.col("_gr") > cap).drop("_gr", *drop)),
            )
        w = Window.partitionBy(host_col).orderBy(*keys, *tie)
        ranked = df.withColumn("_prank", F.row_number().over(w))
        drop = ["_prank", *budget_drop]
        return (
            ranked.filter(F.col("_prank") <= cap).drop(*drop),
            ranked.filter(F.col("_prank") > cap).drop(*drop),
        )

    if host_budgets is not None:
        joined = pending.join(
            F.broadcast(host_budgets.select(host_col, "budget")),
            on=host_col, how="left",
        )
        if budget_per_host >= 1_000_000_000:
            # hosts ABSENT from the politeness table keep the unbounded
            # default: schedule them outright instead of funneling them
            # through the per-host window (ADVICE r6 — with one dominant
            # untabled host, phase 1 pruned nothing and phase 2 still ran
            # the whole frontier through one window task); only rows with a
            # finite tabled cap pay the rank
            free = joined.filter(F.col("budget").isNull()).drop("budget")
            sched, over = _rank(
                joined.filter(F.col("budget").isNotNull()),
                F.col("budget"), ["budget"],
            )
            return sched.unionByName(free), over
        return _rank(
            joined, F.coalesce(F.col("budget"), F.lit(budget_per_host)),
            ["budget"],
        )
    return _rank(pending, F.lit(budget_per_host), [])


def salted_repartition(df: DataFrame, n_partitions: int, n_salts: int) -> DataFrame:
    """P8: spread one dominant host over ``n_salts`` sub-buckets."""
    return df.withColumn(
        "salt", F.pmod(F.xxhash64("url"), F.lit(n_salts)).cast("int")
    ).repartition(n_partitions, F.col("host"), F.col("salt"))


# ---------------------------------------------------------------------------
# robots gating


def robots_allowed_udf():
    """pandas UDF (rules, url) -> bool with urllib.robotparser semantics."""

    @F.pandas_udf(BooleanType())
    def _allowed(rules: pd.Series, url: pd.Series) -> pd.Series:
        from urllib.robotparser import RobotFileParser

        cache: dict[str, RobotFileParser] = {}
        out = []
        for r, u in zip(rules, url):
            if r is None or (isinstance(r, float) and pd.isna(r)):
                out.append(True)  # no rules ⇒ allowed
                continue
            rp = cache.get(r)
            if rp is None:
                rp = RobotFileParser()
                rp.parse(r.splitlines())
                cache[r] = rp
            out.append(bool(rp.can_fetch("*", u)))
        return pd.Series(out)

    return _allowed


def robots_gate(frontier: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop frontier rows disallowed by their host's robots.txt."""
    if robots is None:
        return frontier
    joined = frontier.join(F.broadcast(robots), on="host", how="left")
    allowed = robots_allowed_udf()
    return joined.filter(allowed(F.col("rules"), F.col("url"))).drop("rules")


# ---------------------------------------------------------------------------
# duplicate-page early-stop horizon (J4)


def duplicate_page_horizon(
    page_stats: DataFrame, threshold: int = 2
) -> DataFrame:
    """Compute the crawl horizon per (stock_code, content_type).

    Input: one row per processed page with columns
      stock_code, content_type, page, ok (bool: page parsed, not failed),
      new_count (long: rows actually new on that page).
    Output: stock_code, content_type, horizon_page (long; page at which the
    early stop fires — pages AFTER it are cancelled; null ⇒ no stop).

    Sequential semantics: streak of consecutive ok-pages with new_count == 0,
    reset on new_count > 0, failed pages skipped; stop when streak reaches
    ``threshold``.  Window translation: among ok pages ordered by page number,
    streak(p) = idx(p) − last idx with new_count > 0; horizon = min page where
    streak == threshold.
    """
    ok_pages = page_stats.filter(F.col("ok"))
    w = (
        Window.partitionBy("stock_code", "content_type")
        .orderBy("page")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_seq = Window.partitionBy("stock_code", "content_type").orderBy("page")
    with_streak = (
        ok_pages.withColumn("_idx", F.row_number().over(w_seq))
        .withColumn(
            "_last_new_idx",
            F.max(F.when(F.col("new_count") > 0, F.col("_idx"))).over(w),
        )
        .withColumn("_streak", F.col("_idx") - F.coalesce(F.col("_last_new_idx"), F.lit(0)))
    )
    return (
        with_streak.filter(F.col("_streak") >= threshold)
        .groupBy("stock_code", "content_type")
        .agg(F.min("page").alias("horizon_page"))
    )


def prune_beyond_horizon(df: DataFrame, horizons: DataFrame) -> DataFrame:
    """Remove rows with page > horizon_page for their (stock, type)."""
    return (
        df.join(F.broadcast(horizons), on=["stock_code", "content_type"], how="left")
        .filter(F.col("horizon_page").isNull() | (F.col("page") <= F.col("horizon_page")))
        .drop("horizon_page")
    )
