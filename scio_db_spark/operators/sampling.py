"""Weighted sampling without replacement — priority sampling, exact.

``priority_sample(df, "o_orderkey", weight, k)`` draws k rows with
inclusion probability increasing in weight, deterministically, in one
pass, on integer arithmetic only.

Method: priority sampling (Duffield, Lund & Thorup, JACM 2007 /
SIGMETRICS 2004 — public literature). Each row gets a priority
``q = u / w`` where u is a uniform hash of the row's id and w its
weight; the k smallest priorities form the sample. P(row in sample)
rises with w (a row with twice the weight halves its priority), and
the estimator family built on the (k+1)-th priority is unbiased for
subset sums — the property that makes this THE sampling primitive for
sketching heavy-tailed traffic/spend distributions.

Engine-exactness: u is the repo's 60-bit cross-engine md5 hash
(functions/hashing.py) and the division is INTEGER floor division —
no ln(), no pow(), no float anywhere, so DuckDB reproduces the sample
bit-for-bit (A-ES/Gumbel formulations need log(); two libms disagree
in the last ulp and a near-tie at the k boundary would flip the set).
Floor division coarsens priorities slightly; ties are broken by id,
so the drawn set stays a deterministic function of (ids, weights, k).

Scale: the hash/priority projection is map-side codegen; the k-row
selection is a global top-k (TakeOrderedAndProject shape — per-
partition heaps, then k rows to one reducer), never a full sort.

Reference parity: the reference's mock/stratified samplers
(scio-db test utilities) are uniform; weighted sampling is part of
the training-data extension surface this repo adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scio_db_spark.functions.hashing import str_hash60


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight: Column,
    k: int,
    salt: str = "",
) -> DataFrame:
    """k-row weighted sample; returns df's columns + ``priority``.

    ``weight`` must evaluate to a POSITIVE integer (scale fractional
    weights to cents first — exactness is the point). Rows with NULL
    or non-positive weight are excluded: zero weight means zero
    inclusion probability, and a negative weight has no sampling
    semantics. ``salt`` varies the draw without touching the data.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w_int = weight.cast("long")
    hashed = df.withColumn(
        "__w", w_int
    ).filter(F.col("__w") > 0).withColumn(
        "__u",
        str_hash60(F.concat_ws(":", F.lit(salt), F.col(id_col))),
    )
    # Integer floor division: 60-bit hash over a cents-scale weight
    # keeps ~40+ significant bits of priority resolution.
    pri = hashed.withColumn("__q", F.expr("__u DIV __w"))
    # sort+limit (NOT a global row_number window): Catalyst plans this
    # as TakeOrderedAndProject — per-partition k-row heaps, k rows to
    # one reducer — so no full-data SinglePartition exchange at scale.
    return (
        pri.orderBy(F.col("__q").asc(), F.col(id_col).asc())
        .limit(k)
        .select(*df.columns, F.col("__q").alias("priority"))
    )


def priority_sample_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    weight: Column,
    k: int,
    salt: str = "",
) -> DataFrame:
    """k-row weighted sample PER GROUP (stratified priority sampling):
    the same Duffield-Lund-Thorup priority draw, ranked inside each
    group by a Window row_number instead of a global sort+limit.

    One shuffle keyed on the group columns; each group's heap is
    independent, so a skewed group bounds only its own partition (and
    the window is per-group top-k, never a global sort). Contract for
    ``weight``/``salt`` matches priority_sample.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w_int = weight.cast("long")
    hashed = df.withColumn(
        "__w", w_int
    ).filter(F.col("__w") > 0).withColumn(
        "__u",
        str_hash60(F.concat_ws(":", F.lit(salt), F.col(id_col))),
    )
    pri = hashed.withColumn("__q", F.expr("__u DIV __w"))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__q").asc(), F.col(id_col).asc()
    )
    return (
        pri.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(*df.columns, F.col("__q").alias("priority"))
    )
