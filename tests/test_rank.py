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
    # Data path: hash exchange on the deterministic __pid — never a
    # RangePartitioner exchange (its per-instance sampling diverges
    # across column-pruned branches) and never Python (all codegen).
    assert "hashpartitioning(__pid" in plan
    assert "rangepartitioning" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    # SinglePartition exchanges serve only tiny frames: the boundary
    # SAMPLE aggregate and the P-row offsets window.
    assert plan.count("Exchange SinglePartition") <= 2


def test_global_ntile_matches_window_ntile(spark):
    """Exact SQL ntile semantics at awkward n/k (n mod k != 0, ties,
    n < k), vs Spark's own single-partition window as ground truth."""
    from pyspark.sql import Window

    from scio_db_spark.operators.rank import global_ntile

    rng = random.Random(13)
    for n, k in [(97, 10), (100, 7), (5, 8), (64, 1), (33, 33)]:
        vals = [(i, rng.randrange(20)) for i in range(n)]
        df = spark.createDataFrame(
            [Row(id=i, v=v) for i, v in vals], "id long, v long"
        ).repartition(6)
        got = {
            r.id: r.tile
            for r in global_ntile(
                df, [F.desc("v"), F.asc("id")], k, num_partitions=4
            ).collect()
        }
        w = Window.orderBy(F.desc("v"), F.asc("id"))
        want = {
            r.id: r.tile
            for r in df.select(
                "id", F.ntile(k).over(w).alias("tile")
            ).collect()
        }
        assert got == want, f"n={n} k={k}"


def test_global_running_sum_matches_window(spark):
    from pyspark.sql import Window

    from scio_db_spark.operators.rank import global_running_sum

    rng = random.Random(29)
    vals = [(i, rng.randrange(1, 1000)) for i in range(300)]
    df = spark.createDataFrame(
        [Row(id=i, v=v) for i, v in vals], "id long, v long"
    ).repartition(5)
    out = global_running_sum(
        df, [F.desc("v"), F.asc("id")], "v", num_partitions=4
    )
    got = {r.id: (r.cum, r.total) for r in out.collect()}
    w = Window.orderBy(F.desc("v"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = sum(v for _, v in vals)
    want = {
        r.id: (r.cum, total)
        for r in df.select(
            "id", F.sum("v").over(w).alias("cum")
        ).collect()
    }
    assert got == want


def test_global_ntile_no_single_partition_exchange(spark):
    """The point of the operator: the data path must not cross an
    Exchange SinglePartition (only the per-partition offsets frame,
    which is one row per partition, may)."""
    from scio_db_spark.operators.rank import global_ntile

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 13).alias("v")
    )
    out = global_ntile(df, [F.desc("v"), F.asc("id")], 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The data path is hash-partitioned by the deterministic __pid;
    # SinglePartition appears only under the boundary-sample aggregates
    # (one per consumer branch — pid determinism makes the duplication
    # harmless) and the P-row offsets window. All tiny frames.
    assert "hashpartitioning(__pid" in plan
    assert plan.count("SinglePartition") <= 3


def test_rank_null_order_key_refuses_loudly(spark):
    """ADVICE r6: NULL order keys used to silently mis-rank (NULL
    compares as a tie in the boundary comparator while the per-pid
    Window honors NULLS FIRST/LAST, and both plan branches agree so
    the divergence guard can't fire). The non-NULL contract is now a
    runtime assert folded into __pid."""
    import pytest

    from scio_db_spark.operators.rank import global_rank

    df = spark.createDataFrame(
        [(1,), (None,), (3,)], "v long"
    )
    with pytest.raises(Exception, match="NULL order key"):
        global_rank(df, [F.asc("v")], num_partitions=4).collect()


def test_rank_binary_search_matches_many_partition_counts(spark):
    """The O(log P) probe must agree with the window oracle at every
    P, including P > n (some empty pids) and P = 1 (no bounds)."""
    from pyspark.sql import Window

    from scio_db_spark.operators.rank import global_rank

    df = spark.range(500).select(
        (F.col("id") * 2654435761 % 1000).alias("v"),
        F.col("id").alias("tb"),
    )
    oracle = {
        (r.v, r.tb): r.rk
        for r in df.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.asc("v"), F.asc("tb")))
        ).collect()
    }
    # 701 > n exercises empty pids at the tail of the bounds array
    for p in (1, 2, 7, 32, 701):
        got = {
            (r.v, r.tb): r.rank
            for r in global_rank(
                df, [F.asc("v"), F.asc("tb")], num_partitions=p
            ).collect()
        }
        assert got == oracle, f"mismatch at P={p}"


def test_global_running_max_matches_window_oracle(spark):
    from pyspark.sql import Window

    from scio_db_spark.operators.rank import global_running_max

    df = spark.range(2000).select(
        (F.col("id") * 2654435761 % 997).alias("s"),
        F.col("id").alias("tb"),
        ((F.col("id") * 48271) % 313).alias("v"),
    )
    oracle = {
        (r.s, r.tb): r.m
        for r in df.withColumn(
            "m",
            F.max("v").over(
                Window.orderBy(F.desc("s"), F.asc("tb")).rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        ).collect()
    }
    for p in (4, 32, 200):
        got = {
            (r.s, r.tb): (r.cum_max, r.rk)
            for r in global_running_max(
                df,
                [F.desc("s"), F.asc("tb")],
                "v",
                rank_col="rk",
                num_partitions=p,
            ).collect()
        }
        assert {k: v[0] for k, v in got.items()} == oracle, f"P={p}"
        assert sorted(v[1] for v in got.values()) == list(
            range(1, 2001)
        )


def test_two_level_probe_survives_empty_sample(spark):
    """Tiny input at P >= _TWO_LEVEL_MIN_P: the hash sample is likely
    EMPTY, so the bounds AND the block-representative arrays are empty
    — every row must land in pid 0 instead of element_at throwing
    (caught by hypothesis under -W error in round 7)."""
    from scio_db_spark.operators.rank import global_rank

    df = spark.createDataFrame(
        [(i, i * 3 % 7) for i in range(5)], "id long, v long"
    )
    got = {
        r.id: r.rank
        for r in global_rank(
            df, [F.asc("v"), F.asc("id")], num_partitions=256
        ).collect()
    }
    expected = {
        i: pos + 1
        for pos, (i, _) in enumerate(
            sorted(
                ((i, i * 3 % 7) for i in range(5)),
                key=lambda t: (t[1], t[0]),
            )
        )
    }
    assert got == expected
