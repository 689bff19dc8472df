"""Unit tests for the core batch operators (SURVEY.md §2.3-2.7).

Mirrors the reference's spec structure (MediationServiceSpec.scala:85-173):
pure-function checks on keying/validity, pipeline checks on dedup/joins,
and the negative singleton-map contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from scio_db_spark.operators import (
    anti_join_split,
    assert_unique_keys,
    distinct_by_key,
    first_per_key,
    lookup_join,
    mark_duplicates,
    split_ok_ko,
    ttl_sessionize,
    with_idempotent_key,
)
from scio_db_spark.operators.validity import is_valid_ber


def _bers(spark):
    # 3 duplicates of one key + 1 other key + 1 invalid (null customer_id),
    # the MediationServiceSpec.scala:47-57 shape.
    rows = [
        Row(transaction_id="tx1", notification_id="n1", customer_id="1", ts=1.0),
        Row(transaction_id="tx1", notification_id="n1", customer_id="1", ts=2.0),
        Row(transaction_id="tx1", notification_id="n1", customer_id="1", ts=3.0),
        Row(transaction_id="tx2", notification_id="n2", customer_id="2", ts=1.5),
        Row(transaction_id=None, notification_id="n3", customer_id=None, ts=4.0),
    ]
    return spark.createDataFrame(rows)


def test_idempotent_key_shape(spark):
    df = with_idempotent_key(_bers(spark), "transaction_id", "customer_id")
    keys = {r.idempotent_key for r in df.collect()}
    # concat_ws skips nulls (the invalid row keys as just "n3"-less parts).
    assert "tx1-1" in keys and "tx2-2" in keys


def test_validity_split_routes_nulls_to_ko(spark):
    df = _bers(spark)
    ok, ko = split_ok_ko(df, is_valid_ber())
    assert ok.count() == 4
    assert ko.count() == 1
    assert ko.collect()[0].transaction_id is None


def test_distinct_by_key(spark):
    df = with_idempotent_key(_bers(spark), "transaction_id", "customer_id")
    assert distinct_by_key(df, "idempotent_key").count() == 3


def test_first_per_key_deterministic(spark):
    df = with_idempotent_key(_bers(spark), "transaction_id", "customer_id")
    first = first_per_key(df, ["idempotent_key"], ["ts"])
    tx1 = [r for r in first.collect() if r.idempotent_key == "tx1-1"]
    assert len(tx1) == 1 and tx1[0].ts == 1.0


def test_mark_duplicates_contract(spark):
    # D4: 3 copies of a key -> 1 SENT + 2 SENT_OR_DUPLICATED, none dropped.
    df = with_idempotent_key(_bers(spark), "transaction_id", "customer_id")
    marked = mark_duplicates(df, ["idempotent_key"], ["ts"])
    statuses = [
        r.send_status for r in marked.collect() if r.idempotent_key == "tx1-1"
    ]
    assert sorted(statuses) == ["SENT", "SENT_OR_DUPLICATED", "SENT_OR_DUPLICATED"]
    assert marked.count() == 5


def test_ttl_sessionize_reopens_after_gap(spark):
    rows = [
        Row(k="a", ts=0.0),
        Row(k="a", ts=10.0),   # inside TTL -> duplicate
        Row(k="a", ts=200.0),  # gap >= 100 -> new session, SENT again
        Row(k="b", ts=0.0),
    ]
    df = spark.createDataFrame(rows)
    out = ttl_sessionize(df, ["k"], "ts", ttl_seconds=100).collect()
    a = sorted((r.ts, r.session_id, r.send_status) for r in out if r.k == "a")
    assert a == [
        (0.0, 1, "SENT"),
        (10.0, 1, "SENT_OR_DUPLICATED"),
        (200.0, 2, "SENT"),
    ]


def test_anti_join_split(spark):
    stream = spark.createDataFrame([Row(k="x", v=1), Row(k="y", v=2)])
    hist = spark.createDataFrame([Row(k="x")])
    new, dup = anti_join_split(stream, hist, on=["k"])
    assert [r.k for r in new.collect()] == ["y"]
    assert [r.k for r in dup.collect()] == ["x"]


def test_lookup_join_defaults(spark):
    stream = spark.createDataFrame([Row(k="x"), Row(k="z")])
    dim = spark.createDataFrame([Row(k="x", name="ex")])
    out = lookup_join(stream, dim, on=["k"], default={"name": "UNKNOWN"})
    got = {r.k: r.name for r in out.collect()}
    assert got == {"x": "ex", "z": "UNKNOWN"}


def test_assert_unique_keys_raises_on_duplicate(spark):
    # J4 singleton side-input contract (MediationServiceSpec.scala:156-173).
    good = spark.createDataFrame([Row(k="x"), Row(k="y")])
    assert_unique_keys(good, "k")
    bad = spark.createDataFrame([Row(k="x"), Row(k="x")])
    with pytest.raises(ValueError, match="duplicate key"):
        assert_unique_keys(bad, "k")


def test_tumbling_window_agg(spark):
    from scio_db_spark.operators.windows import tumbling_window_agg

    rows = [
        Row(ts="2024-01-01 00:00:10", v=1.0),
        Row(ts="2024-01-01 00:00:20", v=2.0),
        Row(ts="2024-01-01 00:01:10", v=3.0),
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.col("ts").cast("timestamp"))
    out = tumbling_window_agg(df, "ts", "1 minute", aggs={"n": F.count(F.lit(1))})
    got = sorted((r.window.start.isoformat(), r.n) for r in out.collect())
    assert got == [("2024-01-01T00:00:00", 2), ("2024-01-01T00:01:00", 1)]


def test_idempotent_key_null_parts_render_as_null_literal(spark):
    """concat_ws skips nulls; the key must not — (null, x) and (x, null)
    are different records (Scala interpolation renders 'null')."""
    from scio_db_spark.operators.keying import idempotent_key

    df = spark.createDataFrame(
        [("a", None), (None, "a")], "t string, c string"
    ).select(idempotent_key("t", "c").alias("k"))
    assert sorted(r.k for r in df.collect()) == ["a-null", "null-a"]


def test_asof_join_ignores_null_time_and_key_right_rows(spark):
    from scio_db_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 10.0), (None, 10.0)], "key string, t double"
    )
    right = spark.createDataFrame(
        [("k", None, "null-time"), (None, 5.0, "null-key"),
         ("k", 5.0, "real")],
        "key string, rt double, payload string",
    )
    out = asof_join(
        left, right, key="key", left_time="t", right_time="rt",
        payload_cols=["payload"],
    ).collect()
    by_key = {r.key: r.payload for r in out}
    assert by_key["k"] == "real"      # not the null-time row
    assert by_key[None] is None       # null keys never match


def test_distinct_by_key_requires_keys(spark):
    import pytest as _pytest

    from scio_db_spark.operators.dedup import distinct_by_key

    df = spark.range(3)
    with _pytest.raises(ValueError, match="at least one key"):
        distinct_by_key(df)


def test_epsilon_self_join_no_nested_loop_and_exact(spark):
    """The band join must (a) match brute force exactly and (b) plan
    as an equi-join — no BroadcastNestedLoopJoin/CartesianProduct."""
    import itertools

    from pyspark.sql import functions as F

    from scio_db_spark.operators.bandjoin import epsilon_self_join

    rows = [(i, i % 3, (i * 37) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g long, v long")
    out = epsilon_self_join(
        df, id_col="id", value_col="v", eps=4, partition_cols=["g"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    got = {(r.id_a, r.id_b) for r in out.collect()}
    want = {
        (a, b)
        for (a, ga, va), (b, gb, vb) in itertools.combinations(rows, 2)
        if ga == gb and abs(va - vb) <= 4
    }
    assert got == want

    # eps=0: degenerates to value equality, still no duplicates
    out0 = epsilon_self_join(df, "id", "v", eps=0, partition_cols=["g"])
    got0 = sorted((r.id_a, r.id_b) for r in out0.collect())
    want0 = sorted(
        (a, b)
        for (a, ga, va), (b, gb, vb) in itertools.combinations(rows, 2)
        if ga == gb and va == vb
    )
    assert got0 == want0


def test_epsilon_self_join_exact_at_extreme_magnitudes(spark):
    """Band assignment must be exact integer floor division: values
    past 2^53 (where double division rounds) and negative values must
    still pair correctly."""
    big = (1 << 60) + 12345
    rows = [
        (1, big), (2, big + 3),          # within eps at 2^60
        (3, big + 100),                   # outside eps
        (4, -7), (5, -4),                 # negative, within eps
        (6, -1000),
    ]
    from scio_db_spark.operators.bandjoin import epsilon_self_join

    df = spark.createDataFrame(rows, "id long, v long")
    got = sorted(
        (r.id_a, r.id_b)
        for r in epsilon_self_join(df, "id", "v", eps=4).collect()
    )
    assert got == [(1, 2), (4, 5)]
