"""Stream-stream interval join tests (engine surface beyond the
reference — its only joins are side-input lookups, SURVEY.md §2.6).

One monitored source carries both sides tagged by a ``side`` column;
the transform splits it into impressions (L) and clicks (R) and
interval-joins them, which exercises a genuine stream-stream join with
cross-micro-batch buffering.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from scio_db_spark.operators.joins import interval_join
from scio_db_spark.streaming.harness import StreamHarness

SCHEMA = "side string, k string, v double, event_time timestamp"


def _row(side, k, v, ts):
    return Row(
        side=side, k=k, v=v,
        event_time=datetime.datetime.fromisoformat(ts),
    )


def _click_join(s):
    imps = s.filter(F.col("side") == "L").select(
        F.col("k").alias("ik"),
        F.col("v").alias("iv"),
        F.col("event_time").alias("itime"),
    )
    clicks = s.filter(F.col("side") == "R").select(
        F.col("k").alias("ck"),
        F.col("v").alias("cv"),
        F.col("event_time").alias("ctime"),
    )
    # Click must land within 1 minute AFTER its impression.
    return interval_join(
        imps, clicks,
        left_key="ik", right_key="ck",
        left_time="itime", right_time="ctime",
        lower="0 seconds", upper="1 minute",
    )


def test_interval_join_within_batch(spark):
    h = StreamHarness(spark, SCHEMA)
    h.start(_click_join, output_mode="append")
    h.add_batch(
        [
            _row("L", "a", 1.0, "2024-01-01 00:00:10"),
            _row("R", "a", 2.0, "2024-01-01 00:00:40"),  # +30s: match
            _row("L", "b", 3.0, "2024-01-01 00:00:10"),
            _row("R", "b", 4.0, "2024-01-01 00:02:00"),  # +110s: outside
            _row("R", "c", 5.0, "2024-01-01 00:00:20"),  # no impression
        ]
    )
    got = {(r.ik, r.cv) for r in h.results()}
    assert got == {("a", 2.0)}
    h.stop()


def test_interval_join_click_before_impression_no_match(spark):
    h = StreamHarness(spark, SCHEMA)
    h.start(_click_join, output_mode="append")
    h.add_batch(
        [
            _row("L", "a", 1.0, "2024-01-01 00:00:40"),
            _row("R", "a", 2.0, "2024-01-01 00:00:10"),  # 30s BEFORE
        ]
    )
    assert h.results() == []
    h.stop()


def test_interval_join_buffers_across_micro_batches(spark):
    # The impression arrives in batch 1, its click in batch 2 — the
    # join must buffer the impression in state between micro-batches.
    h = StreamHarness(spark, SCHEMA)
    h.start(_click_join, output_mode="append")
    h.add_batch([_row("L", "a", 1.0, "2024-01-01 00:00:10")])
    assert h.results() == []
    h.add_batch([_row("R", "a", 7.0, "2024-01-01 00:00:50")])
    got = {(r.ik, r.cv) for r in h.results()}
    assert got == {("a", 7.0)}
    h.stop()


def test_interval_left_outer_null_pads_after_watermark(spark):
    # Left-outer stream-stream join: an impression with no click emits
    # null-padded ONLY once the watermark passes its match window
    # (before that, a matching click could still arrive).
    def transform(s):
        imps = s.filter(F.col("side") == "L").select(
            F.col("k").alias("ik"),
            F.col("event_time").alias("itime"),
        )
        clicks = s.filter(F.col("side") == "R").select(
            F.col("k").alias("ck"),
            F.col("v").alias("cv"),
            F.col("event_time").alias("ctime"),
        )
        return interval_join(
            imps, clicks,
            left_key="ik", right_key="ck",
            left_time="itime", right_time="ctime",
            lower="0 seconds", upper="1 minute",
            how="left_outer",
        )

    h = StreamHarness(spark, SCHEMA)
    h.start(transform, output_mode="append")
    h.add_batch(
        [
            _row("L", "a", 1.0, "2024-01-01 00:00:10"),  # gets a click
            _row("L", "b", 2.0, "2024-01-01 00:00:10"),  # never clicked
            _row("R", "a", 9.0, "2024-01-01 00:00:30"),
        ]
    )
    got = {(r.ik, r.cv) for r in h.results()}
    assert ("a", 9.0) in got
    assert not any(k == "b" for k, _ in got)  # window still open
    # Advance both sides' watermarks far past b's match window.
    h.add_batch(
        [
            _row("L", "z", 0.0, "2024-01-01 01:00:00"),
            _row("R", "z", 0.0, "2024-01-01 01:00:00"),
        ]
    )
    h.process_pending()
    got = {(r.ik, r.cv) for r in h.results()}
    assert ("b", None) in got  # null-padded once unmatched is certain
    h.stop()
