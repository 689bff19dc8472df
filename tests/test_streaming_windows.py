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


def test_streaming_session_windows_merge_across_batches(spark):
    """W2 session form: rows inside the gap merge into ONE session even
    when they arrive in different micro-batches; the session is emitted
    (append mode) only after the watermark passes its close."""
    h = StreamHarness(spark, SCHEMA)
    try:
        h.start(
            lambda s: (
                s.withWatermark("event_time", "0 seconds")
                .groupBy(
                    F.session_window("event_time", "15 minutes").alias("w"),
                    "k",
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("v").alias("total"),
                )
                .select(
                    "k", "n", "total",
                    F.col("w.start").alias("w_start"),
                    F.col("w.end").alias("w_end"),
                )
            ),
            output_mode="append",
        )
        # two rows 10 min apart (< 15 min gap) in separate micro-batches
        h.add_batch([_row("u1", 1.0, "2024-01-01T10:00:00")])
        h.add_batch([_row("u1", 2.0, "2024-01-01T10:10:00")])
        # advance the watermark far past the session close
        h.add_batch([_row("u2", 9.0, "2024-01-01T12:00:00")])
        h.add_batch([_row("u2", 1.0, "2024-01-01T14:00:00")])
        rows = [r for r in h.results() if r.k == "u1"]
        assert len(rows) == 1  # ONE merged session, not two
        (r,) = rows
        assert r.n == 2 and r.total == 3.0
        assert r.w_start.isoformat() == "2024-01-01T10:00:00"
        # session end = last event + gap
        assert r.w_end.isoformat() == "2024-01-01T10:25:00"
    finally:
        h.stop()
