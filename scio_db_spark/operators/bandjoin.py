"""Epsilon band join: |x - y| <= eps pairs WITHOUT a nested-loop join.

Spark has no native band/range join strategy for a pure inequality —
the naive formulation (theta join on abs(a.v - b.v) <= eps) plans as
BroadcastNestedLoopJoin or a cartesian product, O(n·m) comparisons.
The classic banding trick makes it an equi-join: bucket every value
into width-eps bands; two values within eps must land in the SAME or
ADJACENT bands (|x-y| <= eps ⟹ |floor(x/eps) - floor(y/eps)| <= 1),
so probing each left row against {b-1, b, b+1} via an exploded
equi-join covers every qualifying pair exactly once (the right side
holds ONE band per row, so a pair can only meet at that band's probe)
with O(n) band rows and a 3x probe fan-out. The exact |x-y| <= eps
filter then drops the false band neighbors.

Skew note for 100 TB: a heavily repeated value (a price point, a
default) concentrates one band; the band key participates in an
ordinary shuffle hash join, so AQE's skew-join split applies, and the
partition columns (event_type, day, ...) usually spread it first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def epsilon_self_join(
    df: DataFrame,
    id_col: str,
    value_col: str,
    eps: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """All pairs (a, b) with id_a < id_b, equal partition columns, and
    |value_a - value_b| <= eps. ``value_col`` must be an exact integer
    column (quantize first — float banding is boundary-unstable).

    Returns {partition_cols, <id>_a, <id>_b, <value>_a, <value>_b};
    callers add further pair predicates (different user, etc.) on top.
    """
    if eps < 0:
        raise ValueError(f"eps must be >= 0, got {eps}")
    parts = partition_cols or []
    w = max(eps, 1)
    # floor division in PURE integer arithmetic: value/w as doubles
    # would round for |value| >= 2^53 and put a boundary value in the
    # wrong band (a silent false negative). pmod is non-negative, so
    # (v - pmod(v, w)) DIV w is exact floor division for all int64.
    band = F.expr(
        f"({value_col} - pmod({value_col}, {w})) DIV {w}"
    ).cast("long")
    base = df.select(
        *parts,
        F.col(id_col),
        F.col(value_col),
        band.alias("__band"),
    )
    probe = base.select(
        *parts,
        F.col(id_col).alias(f"{id_col}_a"),
        F.col(value_col).alias(f"{value_col}_a"),
        F.explode(
            F.array(
                F.col("__band") - 1, F.col("__band"), F.col("__band") + 1
            )
        ).alias("__band"),
    )
    build = base.select(
        *parts,
        F.col(id_col).alias(f"{id_col}_b"),
        F.col(value_col).alias(f"{value_col}_b"),
        "__band",
    )
    return (
        probe.join(build, [*parts, "__band"])
        .filter(
            (F.col(f"{id_col}_a") < F.col(f"{id_col}_b"))
            & (
                F.abs(
                    F.col(f"{value_col}_a") - F.col(f"{value_col}_b")
                )
                <= eps
            )
        )
        .drop("__band")
    )
