"""Stream-stream interval join: inner form equals the batch join on
identical inputs regardless of micro-batch boundaries; lateness past
the watermark budget is dropped (the documented divergence)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from scio_db_spark.streaming.harness import DualStreamHarness
from scio_db_spark.streaming.stream_join import interval_stream_join

L_SCHEMA = "user LONG, view_ts TIMESTAMP, page STRING"
R_SCHEMA = "user LONG, buy_ts TIMESTAMP, amount LONG"


def _t(minute, sec=0):
    return datetime(2024, 1, 1, 10, minute, sec)


VIEWS = [
    (1, _t(0), "home"),
    (1, _t(5), "product"),
    (2, _t(1), "home"),
    (3, _t(2), "product"),
]
BUYS = [
    (1, _t(6), 100),  # matches both user-1 views (within 60 min)
    (2, _t(50), 200),  # matches user-2 home view (49 min later)
    (3, _t(1), 300),  # BEFORE the view: no match (lower bound 0)
    (4, _t(7), 400),  # no view at all
]


def _batch_expected(spark):
    l = spark.createDataFrame(VIEWS, L_SCHEMA)
    r = spark.createDataFrame(BUYS, R_SCHEMA)
    j = l.alias("l").join(
        r.alias("r"),
        (F.col("l.user") == F.col("r.user"))
        & (F.col("r.buy_ts") >= F.col("l.view_ts"))
        & (
            F.col("r.buy_ts")
            <= F.col("l.view_ts") + F.expr("INTERVAL 3600 SECONDS")
        ),
    )
    return sorted(
        (r.user, r.view_ts, r.page, r.buy_ts, r.amount)
        for r in j.select(
            "l.user", "view_ts", "page", "buy_ts", "amount"
        ).collect()
    )


def _join(l, r):
    return interval_stream_join(
        l, r, key="user", left_ts="view_ts", right_ts="buy_ts",
        lower_s=0, upper_s=3600, watermark_s=600,
    )


def _run(spark, deliveries):
    h = DualStreamHarness(spark, L_SCHEMA, R_SCHEMA)
    h.start(_join, output_mode="append")
    for lv, by in deliveries:
        h.add_batches(lv, by)
    got = sorted(
        (r.user, r.view_ts, r.page, r.buy_ts, r.amount)
        for r in h.results()
    )
    h.stop()
    return got


def test_inner_equals_batch_one_batch(spark):
    assert _run(spark, [(VIEWS, BUYS)]) == _batch_expected(spark)


def test_inner_equals_batch_split_and_order_independent(spark):
    expect = _batch_expected(spark)
    # views first, buys later
    assert _run(spark, [(VIEWS, []), ([], BUYS)]) == expect
    # buys BEFORE their views: both sides buffer in state
    assert _run(spark, [([], BUYS), (VIEWS, [])]) == expect
    # interleaved per-row trickle
    trickle = [([v], []) for v in VIEWS] + [([], [b]) for b in BUYS]
    assert _run(spark, trickle) == expect


def test_late_beyond_watermark_is_dropped(spark):
    """A right row arriving with event time older than the watermark
    minus the join range cannot match — the price of bounded state,
    and the one place stream diverges from batch by design."""
    h = DualStreamHarness(spark, L_SCHEMA, R_SCHEMA)
    h.start(_join, output_mode="append")
    # advance both watermarks far past 10:00 (wm = max - 10 min)
    h.add_batches(
        [(9, _t(0), "home"), (9, _t(59, 59), "late-anchor")],
        [(9, _t(59, 58), 1)],
    )
    n_before = len(h.results())
    # this buy WOULD match user-9's 10:00 view in a batch join, but
    # arrives with event time 49+ min behind the ~10:50 watermark
    h.add_batches([], [(9, _t(1), 999)])
    assert len(h.results()) == n_before
    h.stop()


def test_guards_reject_unbounded_and_ambiguous(spark):
    l = spark.createDataFrame([], L_SCHEMA)
    r = spark.createDataFrame([], L_SCHEMA)  # same columns -> ambiguous
    with pytest.raises(ValueError, match="ambiguous"):
        interval_stream_join(
            l, r, "user", "view_ts", "view_ts", 0, 10, 60
        )
    r2 = spark.createDataFrame([], R_SCHEMA)
    with pytest.raises(ValueError, match="empty interval"):
        interval_stream_join(
            l, r2, "user", "view_ts", "buy_ts", 100, 0, 60
        )


def test_left_outer_emits_nulls_after_watermark_horizon(spark):
    """Outer rows must appear exactly once the watermark proves no
    match can arrive — and never for left rows that DID match."""
    from scio_db_spark.streaming.stream_join import absence_detect_stream

    def _absence(l, r):
        return absence_detect_stream(
            l, r, key="user", left_ts="view_ts", right_ts="buy_ts",
            within_s=3600, watermark_s=600,
        )

    h = DualStreamHarness(spark, L_SCHEMA, R_SCHEMA)
    h.start(_absence, output_mode="append")
    # user 9's view never converts; user 1 converts inside the hour
    h.add_batches(
        [(9, _t(0), "home"), (1, _t(1), "product")],
        [(1, _t(5), 100)],
    )
    # nothing can be emitted yet: watermark hasn't passed the horizon
    early = list(h.results())
    # advance both watermarks far past view + 3600s + 600s lateness
    h.add_batches(
        [(99, datetime(2024, 1, 1, 14, 0), "advancer")],
        [(99, datetime(2024, 1, 1, 14, 0), 1)],
    )
    got = sorted((r.user, r.page) for r in h.results())
    h.stop()
    assert (9, "home") in got
    assert all(u != 1 for u, _ in got), "matched row leaked as absence"
    # before the advancer batch the watermark was still at the first
    # batch's horizon: no absence row may have been emitted yet
    assert early == []
