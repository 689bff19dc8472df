"""CUSUM drift detection as two stacked window passes — no recursion.

The CUSUM statistic S_i = max(0, S_{i-1} + (y_i - k)) looks like an
inherently sequential recurrence, which is why most engines implement
it row-at-a-time (and why a naive port would be a Python UDF over
collected rows). It has a closed form over prefix sums:

    P_i = sum_{j<=i} (y_j - k)
    S_i = P_i - min(0, min_{j<=i} P_j)

so the whole per-key statistic is two running aggregates over ONE
(partitionBy key, orderBy ts, tie) sort: a running sum, then a running
min of that sum. Catalyst stacks both (plus the lag used for crossing
detection) onto a single Exchange + Sort — the same one-shuffle shape
as any windowed aggregation, fully JVM-side, O(n_k) per key.

Exactness: inputs are quantized to integer units (e.g. cents) BEFORE
the sums, so P, S and the h comparison are exact integer arithmetic —
the batch result is bit-comparable across engines and equals what a
sequential streaming evaluation of the recurrence produces (the same
integer-exactness contract as streaming/anomaly.py).

Semantics: this is the zero-floored one-sided (upper) CUSUM WITHOUT
post-alarm reset — S keeps accumulating after a crossing, and
"alarms" are counted as up-crossings of h (S_i > h where S_{i-1} <= h,
with S_{-1} = 0). The resetting variant re-anchors the statistic after
each alarm and is genuinely sequential; the up-crossing count of the
non-resetting form is the standard monitoring proxy and detects the
same drift onsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_scores(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    value_col,
    target: int,
    threshold: int,
) -> DataFrame:
    """Per-row CUSUM statistic and alarm flag (the batch twin of
    ``streaming.cusum_stream.cusum_detect_stream`` — identical
    integers, identical decisions for identical row order).

    ``value_col`` must already be an exact-integer Column (quantize
    floats to cents/micros first). Adds ``cusum`` (the zero-floored
    statistic S_i) and ``is_alarm`` (up-crossing of ``threshold``).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d = df.select(
        key_col, ts_col, tie_col, (value_col - F.lit(target)).alias("_d")
    )
    p = d.withColumn("_p", F.sum("_d").over(run))
    s = p.withColumn(
        "_s",
        F.col("_p") - F.least(F.lit(0).cast("long"), F.min("_p").over(run)),
    )
    return s.withColumn(
        "_alarm",
        (F.col("_s") > threshold)
        & (F.coalesce(F.lag("_s").over(w), F.lit(0)) <= threshold),
    ).select(
        key_col,
        ts_col,
        tie_col,
        F.col("_s").alias("cusum"),
        F.col("_alarm").alias("is_alarm"),
    )


def cusum_crossings(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tie_col: str,
    value_col,
    target: int,
    threshold: int,
) -> DataFrame:
    """Per-key CUSUM up-crossing census over ``cusum_scores``:
    ``n_crossings``, ``first_alarm_ts`` (NULL when none),
    ``max_cusum``."""
    scored = cusum_scores(
        df, key_col, ts_col, tie_col, value_col, target, threshold
    ).select(
        key_col,
        ts_col,
        F.col("cusum").alias("_s"),
        F.col("is_alarm").alias("_alarm"),
    )
    return scored.groupBy(key_col).agg(
        F.sum(F.col("_alarm").cast("long")).alias("n_crossings"),
        F.min(F.when(F.col("_alarm"), F.col(ts_col))).alias(
            "first_alarm_ts"
        ),
        F.max("_s").alias("max_cusum"),
    )
