"""Bucketed tables: shuffle-free repeat joins and aggregations.

The 100 TB lever SCALE.md promises: when a fact table is joined (or
aggregated) on the same key query after query, pay the partitioning
ONCE at write time. ``bucketBy(n, key)`` hash-partitions rows into a
fixed number of buckets per output partition; two tables bucketed on
the join key with the same bucket count sort-merge join with NO
Exchange on either side, and a ``groupBy(key)`` over one bucketed
table skips its shuffle too. ``sortBy`` additionally pre-sorts within
buckets, letting the merge skip its Sort.

This is the batch analogue of the reference's keyed-state partitioning
requirement (records must be co-located by key before stateful ops,
``MediationService.scala:224``) — there Beam shuffles per pipeline run;
here the layout is persisted so the shuffle happens zero times per
subsequent query.

Pick the bucket count once per table: ~(table size / 128 MiB) at the
target scale, and the SAME count on every table sharing the join key —
mismatched counts fall back to a shuffle on one side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed_table(
    df: DataFrame,
    name: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) table."""
    writer = df.write.mode(mode).format(fmt).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def bucketed_join_plan_is_shuffle_free(joined: DataFrame) -> bool:
    """True iff the physical plan contains no shuffle Exchange.

    The verification hook for bucket layouts: after writing two tables
    with matching buckets, their key join must plan without any
    ``Exchange hashpartitioning`` (broadcast exchanges also count as
    absent-by-design here — bucketing exists for the case where BOTH
    sides are too big to broadcast).
    """
    import re

    from scio_db_spark.plans.explain import plan_string

    plan = plan_string(joined)
    # Match Exchange as a plan NODE ("(4) Exchange" in formatted mode),
    # not a bare substring — a column or table literally named
    # 'ExchangeRate' appears in Output/Arguments lines and would fail
    # the check for a genuinely shuffle-free plan.
    return re.search(r"\(\d+\) Exchange\b", plan) is None
