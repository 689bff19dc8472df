"""As-of join operator tests."""

from __future__ import annotations

from pyspark.sql import Row

from scio_db_spark.operators.asof import asof_join


def _go(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k string, t double, eid int")
    right = spark.createDataFrame(
        right_rows, "k string, rt double, fact int"
    )
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        payload_cols=["fact"], tie_col="fact",
    )
    return {r.eid: r.fact for r in out.collect()}


def test_asof_basic_latest_at_or_before(spark):
    got = _go(
        spark,
        [Row("a", 5.0, 1), Row("a", 10.0, 2), Row("a", 0.5, 3)],
        [Row("a", 1.0, 100), Row("a", 7.0, 200), Row("a", 99.0, 300)],
    )
    assert got == {1: 100, 2: 200, 3: None}  # 0.5 precedes every fact


def test_asof_same_instant_matches_inclusive(spark):
    got = _go(spark, [Row("a", 7.0, 1)], [Row("a", 7.0, 100)])
    assert got == {1: 100}


def test_asof_tie_resolved_by_max_tiecol(spark):
    got = _go(
        spark,
        [Row("a", 8.0, 1)],
        [Row("a", 7.0, 100), Row("a", 7.0, 150)],
    )
    assert got == {1: 150}


def test_asof_keys_do_not_leak(spark):
    got = _go(
        spark,
        [Row("a", 5.0, 1), Row("b", 5.0, 2)],
        [Row("a", 1.0, 100)],
    )
    assert got == {1: 100, 2: None}


def test_asof_null_payload_in_latest_row_not_backfilled(spark):
    # Regression: the latest right row's NULL payload must surface as
    # NULL, not be backfilled per-column from an OLDER right row
    # (which would fabricate a mixed row that never existed).
    left = spark.createDataFrame(
        [Row(k="a", t=10.0, eid=1)], "k string, t double, eid int"
    )
    right = spark.createDataFrame(
        [Row(k="a", rt=1.0, fact=100, other=7),
         Row(k="a", rt=5.0, fact=None, other=8)],
        "k string, rt double, fact int, other int",
    )
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        payload_cols=["fact", "other"],
    ).collect()[0]
    assert (out.fact, out.other) == (None, 8)  # the t=5 row, verbatim
