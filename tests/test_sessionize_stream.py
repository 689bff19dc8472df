"""Streaming sessionization ≡ batch ttl_sessionize: identical session
ids and statuses regardless of micro-batch boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from scio_db_spark.operators.dedup import ttl_sessionize
from scio_db_spark.streaming.harness import StreamHarness
from scio_db_spark.streaming.sessionize_stream import sessionize_stream

SCHEMA = StructType(
    [
        StructField("k", StringType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
    ]
)

_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(key, offsets_s, start_id=0):
    return [
        (key, _T0 + dt.timedelta(seconds=o), start_id + i)
        for i, o in enumerate(offsets_s)
    ]


def _batch(spark, rows, ttl):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.k, r.event_id): (r.session_id, r.send_status)
        for r in ttl_sessionize(
            df, ["k"], "ts", ttl, tie_cols=["event_id"]
        ).collect()
    }


def _stream(spark, batches, ttl):
    hn = StreamHarness(spark, SCHEMA)
    hn.start(
        lambda s: sessionize_stream(
            s, ["k"], "ts", ttl, tie_cols=["event_id"]
        ),
        output_mode="append",
    )
    for b in batches:
        hn.add_batch(b)
    got = {
        (r.k, r.event_id): (r.session_id, r.send_status)
        for r in hn.results()
    }
    hn.stop()
    return got


def test_stream_sessionize_equals_batch_across_cuts(spark):
    # gaps: 0,5,400(new),2,399.9999,400.0 exactly (boundary), ...
    offs = [0, 5, 405, 407, 806.9999, 1207.0]
    rows = _rows("a", offs) + _rows("b", [0, 1000, 2000], start_id=10)
    expect = _batch(spark, rows, ttl=400)
    order = sorted(rows, key=lambda r: (r[1], r[2]))
    for cuts in ([9], [2, 3, 2], [1, 1, 1, 1, 1, 1, 1, 1, 1]):
        batches, i = [], 0
        for c in cuts:
            batches.append(order[i : i + c])
            i += c
        batches.append(order[i:])
        got = _stream(spark, [b for b in batches if b], ttl=400)
        assert got == expect, f"diverged at cuts {cuts}"


def test_stream_sessionize_timestamp_ties_use_tiebreaker(spark):
    rows = [
        ("a", _T0, 2),
        ("a", _T0, 1),  # same ts: event_id order decides
        ("a", _T0 + dt.timedelta(seconds=500), 3),
    ]
    expect = _batch(spark, rows, ttl=400)
    got = _stream(spark, [rows], ttl=400)
    assert got == expect
    assert expect[("a", 1)][1] == "SENT"
    assert expect[("a", 2)][1] == "SENT_OR_DUPLICATED"
