"""operators/sliding.py + operators/sampling.py — property tests.

The registry rows (events_rolling_7d_actives, orders_priority_sample)
pin both operators against DuckDB twins on the gate data; these tests
pin the operator SEMANTICS against brute-force reimplementations on
adversarial small inputs (gaps, ties, NULLs, boundary weights).
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from scio_db_spark.operators.sampling import priority_sample
from scio_db_spark.operators.sliding import rolling_distinct_count

# ----------------------------------------------------------------- sliding


def _naive_rolling(rows, window_days):
    """Brute force: for each day present, scan the trailing window."""
    act = {(e, d) for e, d in rows if e is not None and d is not None}
    days = sorted({d for _, d in act})
    out = {}
    for day in days:
        lo = day - dt.timedelta(days=window_days - 1)
        out[day] = len({e for e, d in act if lo <= d <= day})
    return out


@pytest.mark.parametrize("window_days", [1, 3, 7])
def test_rolling_distinct_matches_naive(spark, window_days):
    rng = random.Random(42 + window_days)
    base = dt.date(2024, 3, 1)
    rows = [
        (
            rng.randrange(12),
            base + dt.timedelta(days=rng.randrange(20)),
        )
        for _ in range(300)
    ]
    # Calendar gaps: wipe a band of days so windows straddle emptiness.
    rows = [
        (e, d) for e, d in rows if not (8 <= (d - base).days <= 10)
    ] + [(None, base), (0, None)]
    df = spark.createDataFrame(rows, "user_id long, d date")
    got = {
        r["d2"]: r["n"]
        for r in rolling_distinct_count(
            df.select("user_id", F.col("d").alias("d2")),
            "user_id",
            "d2",
            window_days,
            out_col="n",
        )
        .withColumnRenamed("day", "d2")
        .collect()
    }
    want = _naive_rolling(
        [(e, d) for e, d in rows], window_days
    )
    assert got == want


def test_rolling_distinct_rejects_bad_window(spark):
    df = spark.createDataFrame([(1, dt.date(2024, 1, 1))], "e long, d date")
    with pytest.raises(ValueError):
        rolling_distinct_count(df, "e", "d", 0)


def test_rolling_distinct_emits_only_observed_days(spark):
    # Two activity days 10 apart: no rows for the silent days between,
    # and no +N tail after the last day.
    df = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1)), (2, dt.date(2024, 1, 11))],
        "e long, d date",
    )
    out = rolling_distinct_count(df, "e", "d", 7).collect()
    assert sorted(r["day"] for r in out) == [
        dt.date(2024, 1, 1),
        dt.date(2024, 1, 11),
    ]
    assert all(r["n_distinct"] == 1 for r in out)


# ---------------------------------------------------------------- sampling


def _orders_df(spark, n=200, seed=7):
    rng = random.Random(seed)
    rows = [(i, float(rng.randrange(1, 10_000)) / 100) for i in range(n)]
    return spark.createDataFrame(rows, "id long, price double")


def test_priority_sample_is_deterministic_and_k_rows(spark):
    df = _orders_df(spark)
    w = F.expr("CAST(floor(price * 100) AS BIGINT)")
    a = sorted(r.id for r in priority_sample(df, "id", w, 25).collect())
    b = sorted(r.id for r in priority_sample(df, "id", w, 25).collect())
    assert len(a) == 25
    assert a == b
    # A different salt draws a different set (overwhelmingly).
    c = sorted(
        r.id for r in priority_sample(df, "id", w, 25, salt="x").collect()
    )
    assert a != c


def test_priority_sample_matches_bruteforce(spark):
    """The drawn set is exactly the k smallest (hash DIV weight, id)."""
    import hashlib

    df = _orders_df(spark, n=120, seed=11)
    rows = {r.id: r.price for r in df.collect()}

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    pris = sorted(
        (h60(f"s:{i}") // int(p * 100 // 1), i)
        for i, p in rows.items()
        if int(p * 100 // 1) > 0
    )
    want = sorted(i for _, i in pris[:10])
    got = sorted(
        r.id for r in priority_sample(
            df, "id", F.expr("CAST(floor(price * 100) AS BIGINT)"), 10,
            salt="s",
        ).collect()
    )
    assert got == want


def test_priority_sample_excludes_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 0), (3, -5), (4, None), (5, 50)],
        "id long, w long",
    )
    out = priority_sample(df, "id", F.col("w"), 10)
    assert sorted(r.id for r in out.collect()) == [1, 5]


def test_priority_sample_weight_monotonicity(spark):
    """Raising a sampled row's weight can never evict it: priority
    u DIV w is non-increasing in w while every other row is unchanged."""
    base = _orders_df(spark, n=60, seed=3)
    w = F.expr("CAST(floor(price * 100) AS BIGINT)")
    picked = {r.id for r in priority_sample(base, "id", w, 15).collect()}
    boosted = base.select(
        "id",
        F.when(F.col("id").isin(*picked), F.col("price") * 10)
        .otherwise(F.col("price"))
        .alias("price"),
    )
    picked2 = {
        r.id for r in priority_sample(boosted, "id", w, 15).collect()
    }
    assert picked <= picked2
