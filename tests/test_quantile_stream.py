"""Streaming log-grid histogram == batch histogram, bit-for-bit,
across arbitrary micro-batch cuts (the repo's standard streaming-twin
gate, same as test_cms_stream.py), plus the quantile readout matching
the batch census's walk."""

from __future__ import annotations

from pyspark.sql import functions as F

from scio_db_spark.plans.mediation import grid_bucket_sql
from scio_db_spark.streaming.harness import StreamHarness
from scio_db_spark.streaming.quantile_stream import (
    grid_quantiles,
    streaming_latency_grid,
)

# latencies spanning several octaves + NULLs (non-converters)
LATS = [
    (3,), (7,), (64,), (65,), (100,), (None,), (1023,), (1024,),
    (4096,), (4100,), (None,), (70000,), (70001,), (123456789,),
    (2,), (99,), (3,), (1_000_000_000_000,),
]


def _batch_hist(spark):
    df = spark.createDataFrame(LATS, "lat_us long")
    return {
        r.blo: r.cnt
        for r in df.select(
            F.expr(grid_bucket_sql("lat_us")).alias("blo")
        )
        .filter(F.col("blo").isNotNull())
        .groupBy("blo")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }


def test_streaming_grid_matches_batch_across_cuts(spark):
    expected = _batch_hist(spark)
    h = StreamHarness(spark, "lat_us long")
    h.start(streaming_latency_grid, output_mode="update")
    try:
        # three uneven micro-batch cuts
        h.add_batch(LATS[:2])
        h.add_batch(LATS[2:11])
        h.add_batch(LATS[11:])
        final = {}
        for r in h.results():  # last emission per bucket wins
            final[r.blo] = r.cnt
    finally:
        h.stop()
    assert final == expected


def test_streaming_grid_state_is_bounded(spark):
    """A second pass of the SAME values doubles counts but cannot grow
    the bucket set — state is O(octaves x 2^6), not O(stream)."""
    h = StreamHarness(spark, "lat_us long")
    h.start(streaming_latency_grid, output_mode="update")
    try:
        h.add_batch(LATS)
        first = {}
        for r in h.results():
            first[r.blo] = r.cnt
        h.add_batch(LATS)
        second = {}
        for r in h.results():
            second[r.blo] = r.cnt
    finally:
        h.stop()
    final = {**first, **second}
    assert set(final) == set(first)
    assert all(final[b] == 2 * first[b] for b in first)
    assert len(final) <= 63 * 64


def test_grid_quantile_readout_matches_batch_walk(spark):
    """p50/p90 from the streamed histogram == the batch census's
    cumulative-rank walk over the same data (and respect the grid's
    floor bound against exact order statistics)."""
    hist = _batch_hist(spark)
    vals = sorted(v for (v,) in LATS if v is not None)
    n = len(vals)
    got = grid_quantiles(hist, (0.5, 0.9))
    for q in (0.5, 0.9):
        num, den = q.as_integer_ratio()
        rank = (n - 1) * num // den + 1
        x = vals[rank - 1]
        assert got[q] <= x
        assert got[q] > x * (1 - 2**-6)


def test_grid_quantiles_empty_hist():
    assert grid_quantiles({}, (0.5,)) == {0.5: None}
