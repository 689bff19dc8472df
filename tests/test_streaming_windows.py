"""Streaming window/watermark/join tests (SURVEY.md §2.8 W2/W4, §2.6 J2).

The Spark analogues of the reference's windowing semantics:
- tumbling event-time windows with a watermark (W2/W4,
  ``allowedLateness=ZERO`` → rows later than the watermark are
  dropped once the window is finalized);
- stream-static broadcast enrichment re-resolved per micro-batch
  (J2/J5, MinimalPubSubBQLookup.scala:39-46).
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from scio_db_spark.streaming.harness import StreamHarness

SCHEMA = "k string, v double, event_time timestamp"


def _row(k, v, ts):
    import datetime

    return Row(
        k=k, v=v,
        event_time=datetime.datetime.fromisoformat(ts),
    )


def test_streaming_tumbling_window_counts(spark):
    h = StreamHarness(spark, SCHEMA)
    h.start(
        lambda s: s.withWatermark("event_time", "0 seconds")
        .groupBy(F.window("event_time", "1 minute"), F.col("k"))
        .agg(F.count(F.lit(1)).alias("n")),
        output_mode="update",
    )
    h.add_batch(
        [
            _row("a", 1.0, "2024-01-01 00:00:10"),
            _row("a", 2.0, "2024-01-01 00:00:20"),
            _row("b", 3.0, "2024-01-01 00:01:10"),
        ]
    )
    rows = h.results()
    got = {(r.window.start.isoformat(), r.k): r.n for r in rows}
    assert got[("2024-01-01T00:00:00", "a")] == 2
    assert got[("2024-01-01T00:01:00", "b")] == 1
    h.stop()


def test_watermark_drops_late_rows(spark):
    # W4: allowedLateness ZERO — a row older than the advanced
    # watermark is dropped (late pane never re-fires).
    h = StreamHarness(spark, SCHEMA)
    h.start(
        lambda s: s.withWatermark("event_time", "0 seconds")
        .groupBy(F.window("event_time", "1 minute"))
        .agg(F.count(F.lit(1)).alias("n")),
        output_mode="append",  # append emits only FINALIZED windows
    )
    h.add_batch([_row("a", 1.0, "2024-01-01 00:00:10")])
    # Advance the watermark past the first window.
    h.add_batch([_row("a", 1.0, "2024-01-01 00:05:00")])
    h.process_pending()
    n_before = sum(
        r.n for r in h.results()
        if r.window.start.isoformat() == "2024-01-01T00:00:00"
    )
    assert n_before == 1
    # Late row into the already-finalized 00:00 window: dropped.
    h.add_batch([_row("a", 9.0, "2024-01-01 00:00:30")])
    h.add_batch([_row("a", 1.0, "2024-01-01 00:10:00")])
    h.process_pending()
    n_after = sum(
        r.n for r in h.results()
        if r.window.start.isoformat() == "2024-01-01T00:00:00"
    )
    assert n_after == 1  # unchanged — the late row never appeared
    h.stop()


def test_stream_static_broadcast_enrichment(spark):
    # J2: stream ⟕ static dimension with defaults; the static side is
    # broadcast and re-resolved every micro-batch (J5).
    from scio_db_spark.operators.joins import lookup_join

    dim = spark.createDataFrame(
        [Row(k="a", name="alpha"), Row(k="b", name="beta")]
    )
    h = StreamHarness(spark, SCHEMA)
    h.start(
        lambda s: lookup_join(
            s, F.broadcast(dim), on=["k"], default={"name": "UNKNOWN"}
        ),
        output_mode="append",
    )
    h.add_batch(
        [
            _row("a", 1.0, "2024-01-01 00:00:10"),
            _row("z", 2.0, "2024-01-01 00:00:20"),
        ]
    )
    got = {r.k: r.name for r in h.results()}
    assert got == {"a": "alpha", "z": "UNKNOWN"}
    h.stop()
