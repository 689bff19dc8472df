"""Streaming quantiles: the batch log-grid histogram maintained
incrementally by a native update-mode aggregation.

The batch query (plans/mediation.py::latency_quantile_sketch) reduces
latencies to a log-grid bucket histogram (<= 63 * 2^6 cells) and reads
quantiles off the cumulative counts. Bucket counts are pure sums, so —
exactly like the count-min twin (streaming/cms_stream.py) — the
streaming form needs no custom state operator: bucket each arriving
latency with the SAME ``grid_bucket_sql`` definition and let Spark's
incremental streaming aggregation keep the running counts. State is
the histogram itself (fixed cell bound regardless of stream length),
each micro-batch touches only the buckets its rows hit, and the final
counters are BIT-EQUAL to the batch build across arbitrary micro-batch
cuts (tests/test_quantile_stream.py).

This is the latency-SLO census for the mediation stream: the sink
reads p50/p90 off each update via ``grid_quantiles`` (a pure-Python
walk over <= a few thousand buckets — driver-trivial by construction).

Reference contract: the latency stamping/metrics side of the HTTP
sink (SURVEY §2 P4/G2, MediationService.scala latency counters) —
same always-on census shape as the CMS twin, upgraded to quantiles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scio_db_spark.plans.mediation import grid_bucket_sql


def streaming_latency_grid(
    stream_df: DataFrame, value_col: str | Column = "lat_us"
) -> DataFrame:
    """Running log-grid histogram ``(blo, cnt)`` for a streaming
    non-negative integer column. NULL values (non-events) are dropped.
    Attach a sink in update output mode."""
    name = value_col if isinstance(value_col, str) else "__v"
    src = (
        stream_df
        if isinstance(value_col, str)
        else stream_df.select(value_col.alias("__v"))
    )
    return (
        src.select(F.expr(grid_bucket_sql(name)).alias("blo"))
        .filter(F.col("blo").isNotNull())
        .groupBy("blo")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def grid_quantiles(
    hist: dict[int, int], qs: tuple[float, ...] = (0.5, 0.9)
) -> dict[float, int]:
    """Quantile readout over a ``{bucket_floor: count}`` histogram,
    using the batch census's rank convention
    (rank_q = (n-1)*num DIV den + 1 over ascending values): the first
    bucket floor whose cumulative count reaches the rank. Pure Python
    on purpose — the histogram is sink-side state of a few thousand
    entries, not data."""
    n = sum(hist.values())
    if n == 0:
        return {q: None for q in qs}
    out: dict[float, int] = {}
    for q in qs:
        num, den = q.as_integer_ratio()
        rank = (n - 1) * num // den + 1
        cum = 0
        for blo in sorted(hist):
            cum += hist[blo]
            if cum >= rank:
                out[q] = blo
                break
    return out
