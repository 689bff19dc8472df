"""Global-rank operator tests: identical to a total-order row_number,
without the single-partition global sort."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from scio_db_spark.operators.rank import global_rank


def test_global_rank_matches_total_order(spark):
    rng = random.Random(7)
    vals = [(i, rng.random()) for i in range(500)]
    df = spark.createDataFrame(
        [Row(id=i, v=v) for i, v in vals], "id long, v double"
    ).repartition(7)  # scramble the layout first
    out = global_rank(
        df, [F.desc("v"), F.asc("id")], rank_col="rk", num_partitions=5
    )
    got = {r.id: r.rk for r in out.collect()}
    expected = {
        i: pos + 1
        for pos, (i, _) in enumerate(
            sorted(vals, key=lambda t: (-t[1], t[0]))
        )
    }
    assert got == expected


def test_global_rank_dense_duplicates_total_with_tiebreak(spark):
    # Equal sort values straddling range-partition boundaries must get
    # distinct, deterministic ranks via the tiebreaker.
    df = spark.createDataFrame(
        [Row(id=i, v=1.0) for i in range(100)], "id long, v double"
    ).repartition(5)
    out = global_rank(
        df, [F.desc("v"), F.asc("id")], rank_col="rk", num_partitions=4
    )
    got = {r.id: r.rk for r in out.collect()}
    assert got == {i: i + 1 for i in range(100)}


def test_global_rank_single_data_shuffle(spark):
    from scio_db_spark.plans.explain import plan_string

    df = spark.createDataFrame(
        [Row(id=i, v=float(i)) for i in range(100)], "id long, v double"
    )
    out = global_rank(df, [F.asc("v"), F.asc("id")], num_partitions=4)
    plan = plan_string(out)
    # Main path: range shuffle + in-partition sort + Arrow enumeration.
    assert "rangepartitioning" in plan
    assert "MapInPandas" in plan
    # Exactly ONE window — the prefix sum over one count per partition.
    # (A partitionBy(spark_partition_id()) formulation would need a
    # second Window plus a full-data hash exchange feeding it.)
    assert plan.count(") Window") == 1
    # Any single-partition exchange serves only that tiny offsets frame.
    assert plan.count("Exchange SinglePartition") <= 1
