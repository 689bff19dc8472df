"""Streaming SCD2 ≡ batch closed history, across micro-batch cuts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from scio_db_spark.operators.scd2 import scd2_from_log
from scio_db_spark.streaming.harness import StreamHarness
from scio_db_spark.streaming.scd2 import scd2_stream

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("attr", StringType()),
        StructField("ts", TimestampType()),
        StructField("eid", LongType()),
    ]
)


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


_ROWS = [
    (1, "a", _ts(0), 1),
    (1, "a", _ts(1), 2),
    (1, "b", _ts(2), 3),
    (2, "x", _ts(2), 4),
    (1, "b", _ts(3), 5),
    (1, None, _ts(4), 6),   # NULL is a state
    (1, None, _ts(5), 7),
    (1, "a", _ts(6), 8),    # a returns as a NEW run
    (2, "y", _ts(7), 9),
    (3, None, _ts(8), 10),  # leading NULL run -> version 0
    (3, "z", _ts(9), 11),
]


def _batch_closed(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = scd2_from_log(df, "k", "attr", "ts", "eid")
    return sorted(
        (r["k"], r["version"], r["state"], r["valid_from"],
         r["valid_to"], r["n_events"])
        for r in out.filter(~F.col("is_current")).collect()
    )


def _stream_closed(spark, batches):
    h = StreamHarness(spark, SCHEMA)
    h.start(
        lambda s: scd2_stream(s, "k", "attr", "ts", "eid"),
        output_mode="append",
    )
    try:
        for b in batches:
            h.add_batch(b)
        return sorted(
            (r["key"], r["version"], r["state"], r["valid_from"],
             r["valid_to"], r["n_events"])
            for r in h.results()
        )
    finally:
        h.stop()


def test_stream_equals_batch_single_batch(spark):
    assert _stream_closed(spark, [_ROWS]) == _batch_closed(spark, _ROWS)


def test_stream_equals_batch_across_awkward_cuts(spark):
    # cut mid-run (after 1 row of a 2-row run) and right before a
    # change row: boundaries must not move any closed row
    cuts = [[_ROWS[:1], _ROWS[1:4], _ROWS[4:8], _ROWS[8:]],
            [_ROWS[:5], _ROWS[5:6], _ROWS[6:]]]
    want = _batch_closed(spark, _ROWS)
    for batches in cuts:
        assert _stream_closed(spark, batches) == want


def test_open_runs_stay_unemitted(spark):
    # only keys whose attr CHANGED have emitted rows; still-open first
    # runs (key 2's 'x'->'y' closes one; key 3 closes the NULL run)
    closed = _stream_closed(spark, [_ROWS])
    assert {c[0] for c in closed} == {1, 2, 3}
    # key 2: exactly one closed row (version 1, state 'x')
    k2 = [c for c in closed if c[0] == 2]
    assert len(k2) == 1 and k2[0][1] == 1 and k2[0][2] == "x"
    # key 3: the leading NULL run closed with version 0
    k3 = [c for c in closed if c[0] == 3]
    assert len(k3) == 1 and k3[0][1] == 0 and k3[0][2] is None
