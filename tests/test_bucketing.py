"""Bucketed-table tests: the persisted layout must eliminate shuffles.

Substantiates the SCALE.md claim that bucketing converts repeat joins
to shuffle-free sort-merge joins — asserted on the actual physical
plan, not just documented.
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import Row

from scio_db_spark.operators.bucketing import (
    bucketed_join_plan_is_shuffle_free,
    write_bucketed_table,
)


@pytest.fixture
def bucketed_pair(spark):
    suffix = uuid.uuid4().hex[:8]
    names = (f"facts_{suffix}", f"labels_{suffix}")
    facts = spark.createDataFrame(
        [Row(k=i % 50, v=float(i)) for i in range(1000)]
    )
    labels = spark.createDataFrame(
        [Row(k=i, label=f"L{i}") for i in range(50)]
    )
    write_bucketed_table(facts, names[0], 8, ["k"], sort_cols=["k"])
    write_bucketed_table(labels, names[1], 8, ["k"], sort_cols=["k"])
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    facts_t, labels_t = bucketed_pair
    # Force the non-broadcast path: bucketing matters exactly when both
    # sides are too large to broadcast.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(facts_t).join(spark.table(labels_t), "k")
        assert bucketed_join_plan_is_shuffle_free(joined)
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    facts_t, _ = bucketed_pair
    from pyspark.sql import functions as F

    agg = spark.table(facts_t).groupBy("k").agg(F.sum("v").alias("s"))
    assert bucketed_join_plan_is_shuffle_free(agg)
    got = {r.k: r.s for r in agg.collect()}
    assert got[0] == sum(float(i) for i in range(1000) if i % 50 == 0)


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    # Control: the same join on unbucketed frames must contain an
    # Exchange — proving the assertion above actually detects shuffles.
    facts_t, _ = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.table(facts_t).limit(2000)  # strips bucket info
        other = spark.createDataFrame(
            [Row(k=i, label=f"L{i}") for i in range(50)]
        )
        joined = plain.join(other, "k")
        assert not bucketed_join_plan_is_shuffle_free(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
