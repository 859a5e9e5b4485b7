"""User-Agent rotation as data (P9) — the reference's UserAgentManager
(core/user_agent_manager.py:16-121) re-expressed declaratively.

The reference keeps a mutable global manager: a UA list, a rotation mode
('sequential' round-robin index / 'random' with avoid-consecutive), and a
blacklist of UA → expiry-timestamp (expired entries cleaned on every get;
if everything is blacklisted the blacklist resets, :100-103).  That is a
per-request side effect; at 10^10 fetches the same policy must be a COLUMN
computed over the scheduled batch:

- **availability** (``available_user_agents``): the UA table anti-joined
  against still-active blacklist rows; the all-blacklisted reset is a
  bounded-table count (the UA list is politeness metadata, ~dozens of rows).
- **sequential** mode: ua = available[(global fetch rank) % n] — the global
  rank comes from the same two-phase distributed row number the engine uses
  for crawl_seq (no single-partition window).
- **random** mode: a seeded md5 pick (first hex byte of md5(url), a uniform
  0..255 value, mod n) so the "random" choice is reproducible in any
  engine; avoid-consecutive is a
  lag window per host over the canonical order.  Determinization notes vs
  the reference: (1) the reference's sequence is request-completion order
  under threads (nondeterministic); the data version uses the canonical
  crawl order.  (2) the reference avoids repeating the last SERVED UA; the
  data version avoids the last RAW pick (the closed-form one-window rule —
  an adjusted pick can coincide with the previous adjusted pick in the
  raw_i == adjusted_{i-1} ≠ raw_{i-1} corner, ~1/n² of rows).  Both noted
  so the oracle and the engine implement the identical contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def available_user_agents(
    uas: DataFrame, blacklist: DataFrame | None = None, now_ts: float = 0.0
) -> DataFrame:
    """(ua, ua_rank) rows that are usable at ``now_ts``: active blacklist
    entries (until_ts > now) drop out; if EVERY ua is blacklisted the list
    resets to the full set (core/user_agent_manager.py:100-103).  Output is
    re-ranked contiguously (ua_slot 0..n-1) for modular indexing."""
    avail = uas.select("ua", "ua_rank")
    if blacklist is not None:
        active = blacklist.filter(F.col("until_ts") > F.lit(now_ts)).select("ua")
        kept = avail.join(active, on="ua", how="left_anti")
        # the all-blacklisted reset is decided DATA-SIDE (r4 verdict item 6
        # — this sits on the HttpFetcher path, no driver round-trip): a
        # 1-row kept-count aggregate broadcast-joined to a union of the
        # kept rows (tag 1) and the full set (tag 0).  Nonzero count keeps
        # only tag-1 rows; zero count means the tag-1 branch is empty, so
        # exactly the full set survives — never both.
        n_kept = kept.agg(F.count("*").alias("_n_kept"))
        avail = (
            kept.withColumn("_src", F.lit(1))
            .unionByName(avail.withColumn("_src", F.lit(0)))
            .crossJoin(F.broadcast(n_kept))
            .filter((F.col("_src") == 1) | (F.col("_n_kept") == 0))
            .drop("_src", "_n_kept")
        )
    w = Window.orderBy("ua_rank")  # bounded table: global window is fine here
    return avail.withColumn(
        "ua_slot", F.row_number().over(w).cast("long") - 1
    )


def assign_user_agents(
    rows: DataFrame,
    avail: DataFrame,
    mode: str = "sequential",
    order_cols: list[str] | None = None,
    host_col: str = "host",
    url_col: str = "url",
    n_partitions: int = 32,
) -> DataFrame:
    """Adds ``ua`` to ``rows`` per the rotation mode.

    ``avail`` must come from :func:`available_user_agents` (needs ua_slot).
    sequential: slot = global_rank % n over ``order_cols`` (two-phase
    distributed rank).  random: slot = md5-seeded pick, avoid-consecutive
    per host via one lag window over ``order_cols``.
    """
    order_cols = order_cols or [url_col]
    # the available-UA cardinality rides along as a broadcast 1-row
    # aggregate instead of a driver count() — this operator sits on the
    # HttpFetcher hot path and must be free of driver round-trips (r4
    # verdict item 6); an empty UA set fails loudly AT EXECUTION via
    # raise_error (the coalesce's null branch), never silently
    n1 = F.broadcast(avail.agg(F.count("*").alias("_n_avail")))
    guarded_n = F.coalesce(
        F.when(
            F.col("_n_avail") > 0, F.col("_n_avail")
        ),
        F.raise_error(F.lit("no user agents available")),
    )

    if mode == "sequential":
        from .order import global_row_number

        ranked = global_row_number(
            rows, order_cols, out_col="_rn", start=0, n_partitions=n_partitions
        )
        picked = ranked.crossJoin(n1).withColumn(
            "ua_slot", F.pmod(F.col("_rn"), guarded_n)
        )
    elif mode == "random":
        # seeded, engine-portable "random": first md5 hex BYTE (two hex
        # digits, conv base 16 → 0..255, uniform across slots; DuckDB mirror
        # is CAST('0x'||substring(md5(url),1,2) AS INT))
        raw = F.pmod(
            F.conv(F.substring(F.md5(F.col(url_col)), 1, 2), 16, 10).cast("long"),
            guarded_n,
        )
        w = Window.partitionBy(host_col).orderBy(*[F.col(c) for c in order_cols])
        picked = (
            rows.crossJoin(n1)
            .withColumn("_raw", raw)
            .withColumn("_prev", F.lag("_raw").over(w))
            .withColumn(
                "ua_slot",
                F.when(
                    F.col("_raw") == F.col("_prev"),
                    F.pmod(F.col("_raw") + 1, guarded_n),
                ).otherwise(F.col("_raw")),
            )
            .drop("_raw", "_prev")
        )
    else:
        raise ValueError(f"unknown rotation mode {mode!r}")

    out = picked.join(
        F.broadcast(avail.select("ua_slot", "ua")), on="ua_slot", how="left"
    ).drop("_n_avail")
    return out.drop("ua_slot", "_rn") if "_rn" in picked.columns else out.drop("ua_slot")
