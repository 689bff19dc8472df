"""Windowed grouping (G1/W2).

Reference: ``WindowUtils.scala:17-28`` assigns fixed windows then
groups per ``IntervalWindow``; the KO sink uses 30 s windows
(``MediationService.scala:129``). Spark: ``F.window`` produces the
window struct as a first-class column; grouping by it is a plain
hash aggregation (partial map-side combine + one shuffle).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str] | None = None,
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Group by tumbling window (+ optional keys) and aggregate.

    ``aggs`` maps output alias -> aggregate Column; default is count(*).
    """
    keys: list[Column] = [F.window(F.col(ts_col), duration).alias("window")]
    keys += [F.col(c) for c in (group_cols or [])]
    agg_exprs = (
        [c.alias(name) for name, c in aggs.items()]
        if aggs
        else [F.count(F.lit(1)).alias("n")]
    )
    return df.groupBy(*keys).agg(*agg_exprs)


def collect_window_groups(
    df: DataFrame, ts_col: str, duration: str
) -> DataFrame:
    """G1 exact shape: per-window iterable of records (collect_list).

    Used by the windowed file sink; at scale prefer ``partitionBy`` on
    the window column over materializing lists.
    """
    return df.groupBy(F.window(F.col(ts_col), duration).alias("window")).agg(
        F.collect_list(F.struct("*")).alias("records")
    )
