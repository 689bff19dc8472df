"""Streaming count-min sketch: the batch census's mergeable counters
maintained incrementally by a native update-mode aggregation.

The batch query (plans/textops.py::token_cms_topk) builds a FIXED
4x1024-cell counter table; because count-min cells are pure sums, the
streaming form needs no custom state operator at all — explode each
arriving document's tokens into their D cells (the SAME
``cms_cell_array`` definition, so cells are bit-comparable) and let
Spark's incremental streaming aggregation keep the running sums. State
is exactly the counter table: 4096 rows, one long each, regardless of
stream length — the textbook mergeable-sketch win. Bit-equality of
the final counters against the batch build, across arbitrary
micro-batch cuts, is pinned in tests/test_cms_stream.py.

Reference contract: the analytics/metrics side-outputs of the
mediation service (MediationService.scala windowed counts) — this is
the same "cheap always-on census next to the main pipeline" shape,
upgraded to a frequency sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scio_db_spark.functions import text as X
from scio_db_spark.plans.textops import cms_cell_array


def streaming_cms_counters(
    stream_df: DataFrame, text_col: str | Column = "text"
) -> DataFrame:
    """Running count-min counter table for a streaming text column.

    Returns the update-mode aggregate ``(i, bucket, cell)`` — attach a
    sink in update output mode. Each micro-batch touches only the
    cells its tokens hit; everything is native partial-aggregated
    sums (no Python state, no custom operator).
    """
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    cells = stream_df.select(
        F.explode(X.tokens(col)).alias("token")
    ).select(F.explode(cms_cell_array(F.col("token"))).alias("__cell"))
    return (
        cells.select(
            F.col("__cell.i").alias("i"),
            F.col("__cell.bucket").alias("bucket"),
        )
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("cell"))
    )
