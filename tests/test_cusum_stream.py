"""Streaming CUSUM ≡ batch CUSUM: identical integers, identical
alarms, regardless of where micro-batch boundaries fall."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from scio_db_spark.operators.cusum import cusum_crossings, cusum_scores
from scio_db_spark.streaming.cusum_stream import cusum_detect_stream
from scio_db_spark.streaming.harness import StreamHarness

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("seq", LongType()),
        StructField("value", DoubleType()),
    ]
)

_CENTS = "CAST(floor(value * 100) AS BIGINT)"


def _rows(key, values, start=0):
    return [(key, start + i, float(v)) for i, v in enumerate(values)]


def _drift_series():
    # 30 readings around the target, then a sustained +.8 shift that a
    # point-outlier detector would never flag
    return [10.0 + (i % 3) * 0.1 for i in range(30)] + [
        10.8 + (i % 3) * 0.1 for i in range(30)
    ]


def _batch_scores(spark, rows, target, h):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.k, r.seq): (r.cusum, r.is_alarm)
        for r in cusum_scores(
            df, "k", "seq", "seq", F.expr(_CENTS), target, h
        ).collect()
    }


def _stream_scores(spark, batches, target, h):
    hn = StreamHarness(spark, SCHEMA)
    hn.start(
        lambda s: cusum_detect_stream(
            s, "k", F.expr(_CENTS), ("seq",), target, h
        ),
        output_mode="append",
    )
    for b in batches:
        hn.add_batch(b)
    got = {(r.k, r.seq): (r.cusum, r.is_alarm) for r in hn.results()}
    hn.stop()
    return got


def test_stream_equals_batch_across_batch_boundaries(spark):
    rows = _rows("a", _drift_series()) + _rows("b", [10.0] * 60)
    expect = _batch_scores(spark, rows, target=1010, h=200)
    # three different batchings of the SAME row order (incl. a 1-row
    # micro-batch)
    for cuts in ([60], [7, 23, 41], [1, 13, 14, 15, 16]):
        batches, i = [], 0
        order = sorted(rows, key=lambda r: (r[1], r[0]))
        for c in cuts:
            batches.append(order[i : i + c])
            i += c
        batches.append(order[i:])
        got = _stream_scores(spark, batches, target=1010, h=200)
        assert got == expect


def test_drift_alarms_batch_and_census_agree(spark):
    rows = _rows("a", _drift_series())
    df = spark.createDataFrame(rows, SCHEMA)
    scores = cusum_scores(
        df, "k", "seq", "seq", F.expr(_CENTS), 1010, 200
    )
    census = {
        r.k: r
        for r in cusum_crossings(
            df, "k", "seq", "seq", F.expr(_CENTS), 1010, 200
        ).collect()
    }
    alarms = scores.filter(F.col("is_alarm")).collect()
    assert len(alarms) >= 1  # the sustained shift fires
    assert census["a"].n_crossings == len(alarms)
    assert census["a"].first_alarm_ts == min(r.seq for r in alarms)
    assert census["a"].max_cusum == max(
        r.cusum for r in scores.collect()
    )


def test_stream_nulls_excluded_and_state_carries(spark):
    rows = _rows("a", [20.0] * 5) + [("a", 5, None)] + _rows(
        "a", [20.0] * 5, start=6
    )
    expect = _batch_scores(
        spark, [r for r in rows if r[2] is not None], 1000, 100
    )
    got = _stream_scores(spark, [rows[:4], rows[4:]], 1000, 100)
    assert ("a", 5) not in got
    assert got == expect


def test_exact_int64_guard_recovers_or_refuses():
    """Below 2^53 the NULL-driven float64 coercion is reversed
    bit-exactly; at/past 2^53 the loss precedes any possible check,
    so the guard must refuse rather than silently round."""
    import pandas as pd
    import pytest as pt

    from scio_db_spark.streaming.exactness import exact_int64

    small = pd.Series([1.0, -(2.0**52), 2.0**53 - 2.0])
    out = exact_int64(small)
    assert out.dtype.kind == "i"
    assert list(out) == [1, -(2**52), 2**53 - 2]
    ints = pd.Series([1, 2, 3], dtype="int64")
    assert exact_int64(ints) is ints  # non-coerced passes through
    with pt.raises(ValueError, match="2\\^53"):
        exact_int64(pd.Series([1.0, 2.0**53]))
