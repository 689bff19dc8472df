"""Scalable global ranking (total order without a single-node sort).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is the
classic 100 TB trap: Spark plans it as ``Exchange SinglePartition`` —
every row moves to ONE task. ``global_rank`` computes the identical
ranks with ONE data-sized shuffle:

1. ``repartitionByRange`` on the order columns — rows land in range
   partitions that follow the global order (partition 0 holds the
   smallest keys, etc.); the range sampler bounds skew.
2. per-partition counts (map-side partial agg over the reused range
   exchange — the exchange carries one row per partition) → prefix-sum
   offsets, broadcast back.
3. ``sortWithinPartitions`` (in-place, no exchange) + an Arrow-batched
   ``mapInPandas`` that enumerates rows per partition; final rank =
   partition offset + local position.

A window ``partitionBy(spark_partition_id())`` would be simpler but
Catalyst cannot know rows are already co-located by partition id, so
it inserts a SECOND full-data hash exchange — the mapInPandas
enumeration keeps the range shuffle as the only full-data movement.

The order spec must be TOTAL (include a tiebreaker column): ties that
straddle a range boundary would otherwise get nondeterministic ranks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark import TaskContext
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _number_partitions(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    pid = TaskContext.get().partitionId()
    base = 0
    for pdf in batches:
        n = len(pdf)
        pdf = pdf.copy()
        pdf["__pid"] = pid
        pdf["__lrn"] = range(base + 1, base + n + 1)
        base += n
        yield pdf


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``rank_col`` = 1-based position in the total order."""
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    # Branch A: one count per partition (tiny; shares the range
    # exchange with branch B via ReusedExchange in the joined plan).
    counts = (
        ranged.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__pid",
        "__n",  # carried through for the per-row guard below
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    # Branch B: in-partition sort (no exchange) + Arrow enumeration.
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("__pid", LongType()),
            StructField("__lrn", LongType()),
        ]
    )
    numbered = ranged.sortWithinPartitions(*order_by).mapInPandas(
        _number_partitions, out_schema
    )
    # Correctness guard: both branches must observe the SAME range
    # boundaries (they share the exchange via ReusedExchange). If plan
    # canonicalization ever stops unifying them (e.g.
    # spark.sql.exchange.reuse=false), the two branches sample range
    # bounds independently and partition memberships diverge — by
    # pigeonhole some partition then numbers MORE rows than its count,
    # so asserting __lrn <= __n per row turns silent rank corruption
    # into a loud runtime failure at zero extra actions.
    # The assert is folded INTO the rank expression (assert_true
    # returns NULL on success, so coalesce(..., 0) adds nothing) — a
    # dropped side-column would be pruned by Catalyst and never
    # evaluate, making the guard dead code.
    guard = F.coalesce(
        F.assert_true(
            F.col("__lrn") <= F.col("__n"),
            F.lit(
                "global_rank: range-exchange reuse broke — branch "
                "partitioning diverged (see operators/rank.py)"
            ),
        ).cast("long"),
        F.lit(0),
    )
    return (
        numbered.join(F.broadcast(offsets), "__pid")
        .withColumn(
            rank_col,
            (F.col("__off") + F.col("__lrn") + guard).cast("long"),
        )
        .drop("__pid", "__lrn", "__off", "__n")
    )
