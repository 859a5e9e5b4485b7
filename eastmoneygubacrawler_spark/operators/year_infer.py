"""X9 — stateful year inference as pure window algebra.

The reference's old HTML path gets year-less timestamps ("MM-DD HH:MM") and
infers the year with a sequential state machine (archive/main_class.py:354-391):

    if month > last_month + 3: current_year -= 1      # crossed a year going back
    last_month = month

This is the one operator whose reference semantics *require* sequential page
order (README.md:113-116).  The translation: the number of decrements before
row i is the count of rows j ≤ i where month(j) > month(j-1) + 3, i.e. a
running sum over a lag comparison — no UDF, no sequential execution:

    decr = sum(when(month > lag(month) + 3, 1).otherwise(0))
               over (partition by keys order by seq rows unbounded preceding)
    year = start_year - decr
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def infer_year(
    df: DataFrame,
    raw_col: str = "publish_time_raw",
    partition_cols: list | None = None,
    order_cols: list | None = None,
    start_year: int | Column = 2026,
    out_col: str = "publish_time",
) -> DataFrame:
    """Adds ``out_col`` = "YYYY-" + raw, with YYYY inferred per partition.

    ``raw_col`` holds "MM-DD HH:MM"-style strings (month leading).  Rows are
    scanned in ``order_cols`` order within each partition — the data-order
    restatement of the reference's strict page-order consumption.
    """
    partition_cols = partition_cols or []
    order_cols = order_cols or ["page", "item_seq"]
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    month = F.split(F.col(raw_col), "-").getItem(0).try_cast("int")
    # previous *parseable* month: unparseable rows don't update the state
    # machine (the reference's except-path leaves last_month untouched)
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    lag_month = F.last(month, ignorenulls=True).over(w_prev)
    step = F.when(month > lag_month + 3, F.lit(1)).otherwise(F.lit(0))
    decr = F.sum(step).over(w_run)
    year = (
        (F.lit(start_year) if isinstance(start_year, int) else start_year)
        - F.coalesce(decr, F.lit(0))
    )
    return df.withColumn(
        out_col,
        F.when(
            month.isNotNull(),
            F.concat(year.cast("string"), F.lit("-"), F.col(raw_col)),
        ).otherwise(F.col(raw_col)),  # unparseable ⇒ passthrough (reference
        # returns the raw string on failure, archive/main_class.py:389-391)
    )


def infer_year_python(raws: list[str], start_year: int) -> list[str]:
    """The reference algorithm verbatim (for golden generation in tests)."""
    out = []
    last_month = None
    current_year = start_year
    for raw in raws:
        try:
            month = int(raw.split()[0].split("-")[0])
        except (ValueError, IndexError):
            out.append(raw)
            continue
        if last_month is not None and month > last_month + 3:
            current_year -= 1
        last_month = month
        out.append(f"{current_year}-{raw}")
    return out
