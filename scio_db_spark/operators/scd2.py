"""SCD Type-2 history builder: change-tracked dimension rows from a log.

Turns an append-only event/transaction log into slowly-changing-
dimension type-2 history: one row per (key, consecutive run of equal
attribute values) carrying ``valid_from`` / ``valid_to`` /
``version`` / ``is_current`` — the standard warehouse shape for
"what was this entity's state at time T" queries, and the batch twin
of the reference's stateful per-key mediation tracking
(MediationService.scala keyed state; here the full history is
materialized rather than only the latest state).

Distributed shape (what must survive 100 TB):

- ONE hash shuffle on the key serves every window: change detection
  (``lag``), run numbering (running sum of change flags), and the
  next-change timestamp are all computed over the same
  ``(partitionBy key, orderBy ts, tie)`` sort — Catalyst plans them
  in a single Window operator over a single sort, no re-exchange.
- ``valid_to`` is resolved BEFORE collapsing, as the forward-looking
  ``min(CASE WHEN chg THEN ts END)`` over the rows strictly after the
  current one: every row of a run sees the same next change point, so
  the subsequent collapse is a plain aggregate (the window-fold
  discipline from SCALE.md — the alternative collapse-then-lead plan
  costs a third exchange on the collapsed frame).
- The forward min is NOT expressed as ``ROWS BETWEEN 1 FOLLOWING AND
  UNBOUNDED FOLLOWING``: Spark's UnboundedFollowing frame recomputes
  the aggregate from scratch for every row (it cannot retract rows
  from an aggregation buffer), making the window O(n_k^2) per key —
  measured at 0.74 s / 2.4 s / 90 s on 1x/10x/100x replicated events
  (BENCH_LOCAL_r06_scaling.json, pre-fix). Instead it runs over the
  SAME key partitioning with the sort reversed (``ORDER BY ts DESC,
  tie DESC ROWS UNBOUNDED PRECEDING TO 1 PRECEDING``) — an identical
  row set per row, but an UnboundedPreceding frame, which Spark
  grows incrementally: O(n_k). Catalyst plans it as a second Sort
  under the existing Exchange — still exactly one shuffle.
- The collapse groupBy key is ``(key, version)`` — strictly finer
  than the window key, so partial aggregation collapses runs
  map-side within the already-key-partitioned data.

No driver-side state; run counts and versions are exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_log(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """(key, state, version, valid_from, valid_to, is_current,
    n_events) — SCD2 rows per consecutive run of equal ``attr_col``.

    ``tie_col`` makes the within-key order total (same-timestamp rows
    order by it), which makes run boundaries — and therefore the
    whole history — deterministic and engine-independent. ``version``
    is 1-based in event order; ``valid_to`` is the first timestamp of
    the next run (NULL on the current run).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    chg: Column = (
        ~F.lag(attr_col).over(w).eqNullSafe(F.col(attr_col))
    ).cast("int")
    runs = df.select(key_col, attr_col, ts_col, tie_col).withColumn(
        "_chg", chg
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Forward-looking min over "all rows after this one", expressed as
    # an incremental unbounded-PRECEDING frame on the reversed sort —
    # O(n) per key where the 1-FOLLOWING..UNBOUNDED-FOLLOWING form is
    # O(n^2) (see module docstring).
    w_next = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tie_col).desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    runs = runs.withColumn("_version", F.sum("_chg").over(w_run)).withColumn(
        "_next_change_ts",
        F.min(F.when(F.col("_chg") == 1, F.col(ts_col))).over(w_next),
    )
    return (
        runs.groupBy(F.col(key_col), F.col("_version").alias("version"))
        .agg(
            F.min(attr_col).alias("state"),
            F.min(ts_col).alias("valid_from"),
            F.min("_next_change_ts").alias("valid_to"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )
