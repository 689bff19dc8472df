"""Sliding-window COUNT(DISTINCT) — an operator Spark's window menu lacks.

``rolling_distinct_count(df, "user_id", "ts", 7)`` computes, for every
calendar day present in the data, the number of distinct entities seen
in the trailing N-day window ending that day (the "7-day active users"
metric every product pipeline carries).

Spark's window functions reject ``count(distinct ...)`` over a frame,
and the naive form — a self-join of days × the full fact table — is a
range join that re-scans N days of facts per output day. The scale
path used here is the CONTRIBUTION-EXPLODE formulation:

1. distinct-reduce facts to (entity, day) — the frame is bounded by
   |entities| × |days| regardless of fact volume;
2. explode each active day to the N window-end days it contributes to
   (bounded, data-independent ×N row amplification);
3. one hash aggregation: group by window-end day, count distinct
   entity.

Cost = one distinct shuffle + one count-distinct shuffle, both on keys
with natural cardinality; no range join, no per-day re-scan. At 100 TB
the ×N amplification applies to the distinct-REDUCED frame (entities ×
days), not the raw facts, which is why this beats the window/self-join
formulations at scale.

Reference parity: the reference engine exposes windowed distinct
aggregation over its rollup tables; this is the Spark-first
re-expression (no reference code consulted — semantics only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rolling_distinct_count(
    df: DataFrame,
    entity_col: str,
    time_col: str,
    window_days: int,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Trailing ``window_days``-day distinct-entity count per day.

    Returns (day, ``out_col``) for exactly the days that appear in
    ``df`` — a rolling metric is only defined where the calendar has
    data; emitting the +N-day tail after the last fact would report
    windows the source never observed. NULL entities and NULL times
    carry no signal and are dropped (COUNT(DISTINCT) ignores NULL
    anyway; dropping them first keeps the explode from fabricating
    contribution rows).
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    act = (
        df.filter(
            F.col(entity_col).isNotNull() & F.col(time_col).isNotNull()
        )
        .select(
            F.col(entity_col).alias("__e"),
            F.col(time_col).cast("date").alias("__d"),
        )
        .distinct()
    )
    # Days that actually occur — the output domain. Tiny frame
    # (|days|), broadcast onto the rolled aggregate.
    days = act.select(F.col("__d").alias("day")).distinct()
    contrib = act.select(
        "__e",
        F.explode(
            F.sequence(
                F.col("__d"),
                F.date_add(F.col("__d"), window_days - 1),
            )
        ).alias("day"),
    )
    rolled = contrib.groupBy("day").agg(
        F.countDistinct("__e").alias(out_col)
    )
    return rolled.join(F.broadcast(days), "day")
