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


def _go_fwd(spark, left_rows, right_rows):
    left = spark.createDataFrame(left_rows, "k string, t double, eid int")
    right = spark.createDataFrame(
        right_rows, "k string, rt double, fact int"
    )
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        payload_cols=["fact"], tie_col="fact", direction="forward",
    )
    return {r.eid: r.fact for r in out.collect()}


def test_asof_forward_earliest_at_or_after(spark):
    got = _go_fwd(
        spark,
        [Row("a", 5.0, 1), Row("a", 10.0, 2), Row("a", 99.5, 3)],
        [Row("a", 1.0, 100), Row("a", 7.0, 200), Row("a", 99.0, 300)],
    )
    assert got == {1: 200, 2: 300, 3: None}  # 99.5 follows every fact


def test_asof_forward_same_instant_inclusive_and_ties(spark):
    got = _go_fwd(
        spark,
        [Row("a", 7.0, 1)],
        [Row("a", 7.0, 100), Row("a", 7.0, 150), Row("a", 9.0, 900)],
    )
    assert got == {1: 150}  # inclusive; max tie_col wins among equals


def test_asof_forward_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    lrows = [Row("k", float(rng.randrange(100)), i) for i in range(60)]
    rrows = [
        Row("k", float(rng.randrange(100)), 1000 + i) for i in range(40)
    ]
    got = _go_fwd(spark, lrows, rrows)
    for row in lrows:
        after = [r for r in rrows if r[1] >= row[1]]
        expect = None
        if after:
            tmin = min(r[1] for r in after)
            expect = max(r[2] for r in after if r[1] == tmin)
        assert got[row[2]] == expect


def test_asof_forward_null_left_time_gets_null_payload(spark):
    """No right.time compares against NULL — a NULL-time left row
    must get a NULL payload in BOTH directions (desc's NULLS LAST
    default would otherwise hand it the earliest fact)."""
    got = _go_fwd(
        spark,
        [Row("a", None, 1), Row("a", 0.5, 2)],
        [Row("a", 1.0, 100)],
    )
    assert got == {1: None, 2: 100}
    got_b = _go(
        spark,
        [Row("a", None, 1), Row("a", 5.0, 2)],
        [Row("a", 1.0, 100)],
    )
    assert got_b == {1: None, 2: 100}


def test_asof_tolerance_bounds_the_match_horizon(spark):
    """tolerance_s: a carried fact further than the horizon nulls out;
    a fact exactly AT the horizon stays (inclusive, like pandas)."""
    from pyspark.sql import functions as F

    from scio_db_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("a", 1000.0, 1), ("a", 5000.0, 2), ("b", 100.0, 3)],
        "k string, t double, eid int",
    )
    right = spark.createDataFrame(
        [("a", 900.0, 7), ("b", 40.0, 8)],
        "k string, rt double, fact int",
    )
    out = asof_join(
        left.withColumn("t", F.col("t").cast("timestamp")),
        right.withColumn("rt", F.col("rt").cast("timestamp")),
        key="k", left_time="t", right_time="rt",
        payload_cols=["fact"], tolerance_s=100,
    )
    got = {r.eid: r.fact for r in out.collect()}
    # eid 1: fact at 900, 100s before 1000 -> exactly at horizon: kept
    # eid 2: fact 4100s stale -> nulled
    # eid 3: fact 60s before -> kept
    assert got == {1: 7, 2: None, 3: 8}


def test_asof_rejects_reserved_payload_name_with_tolerance(spark):
    """A payload column named '__rt' (or any '__'-reserved name) would
    duplicate the internal horizon field inside the payload struct
    when tolerance_s is set — refused loudly, not silently corrupted."""
    import pytest

    left = spark.createDataFrame(
        [("a", 5.0, 1)], "k string, t double, eid int"
    )
    right = spark.createDataFrame(
        [("a", 1.0, 100)], "k string, rt double, __rt int"
    )
    with pytest.raises(ValueError, match="reserved"):
        asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            payload_cols=["__rt"], tolerance_s=10.0,
        )
    # without a tolerance the internal field is never added — allowed
    out = asof_join(
        left, right, key="k", left_time="t", right_time="rt",
        payload_cols=["__rt"],
    )
    assert out.collect()[0]["__rt"] == 100
