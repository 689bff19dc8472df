"""SCD2 history builder and exact heavy hitters (operator-level).

The registry rows pin both against DuckDB at gate SFs; these tests pin
the operator semantics on constructed edges the synthetic tables don't
exercise: NULL attribute runs, same-timestamp tie-breaks, adversarial
key distributions at the minimal counter budget, and NULL keys.
"""

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

from scio_db_spark.operators.heavyhitters import heavy_hitters_exact
from scio_db_spark.operators.scd2 import scd2_from_log


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, s)


_LOG_SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("attr", StringType()),
        StructField("ts", TimestampType()),
        StructField("eid", LongType()),
    ]
)


class TestScd2:
    def _hist(self, spark, rows):
        df = spark.createDataFrame(rows, _LOG_SCHEMA)
        out = scd2_from_log(df, "k", "attr", "ts", "eid")
        return sorted(
            (
                r["k"], r["version"], r["state"], r["valid_from"],
                r["valid_to"], r["n_events"], r["is_current"],
            )
            for r in out.collect()
        )

    def test_runs_versions_validity(self, spark):
        rows = [
            (1, "a", _ts(0), 1),
            (1, "a", _ts(1), 2),
            (1, "b", _ts(2), 3),
            (1, "a", _ts(3), 4),  # a returns: NEW run, not merged
            (2, "x", _ts(0), 5),
        ]
        assert self._hist(spark, rows) == [
            (1, 1, "a", _ts(0), _ts(2), 2, False),
            (1, 2, "b", _ts(2), _ts(3), 1, False),
            (1, 3, "a", _ts(3), None, 1, True),
            (2, 1, "x", _ts(0), None, 1, True),
        ]

    def test_same_ts_breaks_by_tie_col(self, spark):
        # identical timestamps: eid orders the run boundary
        rows = [
            (1, "b", _ts(0), 2),
            (1, "a", _ts(0), 1),
        ]
        assert self._hist(spark, rows) == [
            (1, 1, "a", _ts(0), _ts(0), 1, False),
            (1, 2, "b", _ts(0), None, 1, True),
        ]

    def test_null_attr_is_a_state(self, spark):
        # NULL -> NULL is NOT a change (null-safe comparison); a
        # leading NULL run gets version 0 (lag NULL == attr NULL)
        rows = [
            (1, None, _ts(0), 1),
            (1, None, _ts(1), 2),
            (1, "a", _ts(2), 3),
        ]
        assert self._hist(spark, rows) == [
            (1, 0, None, _ts(0), _ts(2), 2, False),
            (1, 1, "a", _ts(2), None, 1, True),
        ]


class TestHeavyHitters:
    def _check(self, spark, keys, phi_inv, m=None):
        df = spark.createDataFrame(
            [(k,) for k in keys], "k long"
        ).repartition(8)
        got = {
            (r["k"], r["cnt"])
            for r in heavy_hitters_exact(df, "k", phi_inv, m=m).collect()
        }
        n = len(keys)
        from collections import Counter

        want = {
            (k, c) for k, c in Counter(keys).items() if c * phi_inv > n
        }
        assert got == want

    def test_matches_naive_on_skewed(self, spark):
        # two heavy keys drowned in a long uniform tail
        keys = [1] * 300 + [2] * 120 + list(range(100, 1000))
        self._check(spark, keys, phi_inv=8)

    def test_minimal_counter_budget(self, spark):
        # m = phi_inv is the edge of the superset guarantee
        keys = [7] * 500 + list(range(10_000, 11_000)) * 2
        self._check(spark, keys, phi_inv=6, m=6)

    def test_null_keys_counted(self, spark):
        keys = [None] * 50 + [1] * 40 + list(range(2, 30))
        df = spark.createDataFrame(
            [(k,) for k in keys], "k long"
        ).repartition(4)
        got = {
            (r["k"], r["cnt"])
            for r in heavy_hitters_exact(df, "k", phi_inv=4).collect()
        }
        assert got == {(None, 50), (1, 40)}

    def test_no_heavy_keys_is_empty(self, spark):
        keys = list(range(500))
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        assert heavy_hitters_exact(df, "k", phi_inv=100).count() == 0


def test_heavy_hitters_exact_int64_guard_with_nulls(spark):
    """A NULL-bearing chunk float-coerces an int64 key; sub-2^53 keys
    must survive bit-exactly and huge keys must refuse loudly rather
    than silently rounding out of the candidate superset."""
    import pytest

    from scio_db_spark.operators.heavyhitters import heavy_hitters_exact

    big = (1 << 53) - 2  # exactly representable; round-trips
    rows = [(big,)] * 40 + [(None,)] * 5 + [(7,)] * 3
    df = spark.createDataFrame(rows, "k long").coalesce(1)
    got = {
        r.k: r.cnt
        for r in heavy_hitters_exact(df, "k", phi_inv=4).collect()
    }
    assert got[big] == 40  # recovered exactly through the coercion

    toobig = 1 << 53  # not verifiable after float64 coercion
    df2 = spark.createDataFrame(
        [(toobig,)] * 40 + [(None,)] * 5, "k long"
    ).coalesce(1)
    with pytest.raises(Exception, match="2\\^53"):
        heavy_hitters_exact(df2, "k", phi_inv=4).collect()
