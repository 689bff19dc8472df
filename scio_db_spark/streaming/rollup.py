"""Continuous rollup — a hypertable-style continuous aggregate.

The batch form of time-bucketed aggregation is the oracle-checked
``events_windowed_counts`` family; this is its STREAMING maintenance
path: a watermarked tumbling-window aggregate whose finalized buckets
are appended to a partitioned table that readers query like any other
parquet table, with partition pruning on the bucket date.

Semantics (the TimescaleDB continuous-aggregate contract, re-expressed
on Structured Streaming):

- append output mode ⇒ a bucket is written EXACTLY ONCE, after the
  watermark passes its end (no partial buckets in the table; late rows
  inside ``allowed_lateness`` still count);
- the bucket table is partitioned by ``bucket_date`` so range queries
  prune partitions at the scan;
- micro-batch replays are idempotent: each epoch's buckets land under
  an ``epoch=N`` partition replaced via dynamic partition overwrite
  (``sinks/files.py::idempotent_batch_writer`` mechanism).

Scale: the only state is Spark's windowed-aggregation state, bounded
by (watermark horizon × group cardinality); the write is an
append-only partitioned insert — no read-modify-write of the rollup
table, so the maintenance cost is independent of the table's size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rollup_plan(
    stream_df: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: dict[str, Column],
    group_cols: tuple[str, ...] = (),
    allowed_lateness: str = "0 seconds",
) -> DataFrame:
    """The windowed-aggregate plan (usable batch or streaming).

    Output columns: ``bucket_start``, ``bucket_end``, ``bucket_date``
    (partition key), then ``group_cols``, then one column per ``aggs``
    entry.
    """
    win = F.window(F.col(ts_col), window_duration)
    df = stream_df
    if df.isStreaming:
        df = df.withWatermark(ts_col, allowed_lateness)
    out = df.groupBy(win.alias("__w"), *group_cols).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    return out.select(
        F.col("__w.start").alias("bucket_start"),
        F.col("__w.end").alias("bucket_end"),
        F.date_format("__w.start", "yyyy-MM-dd").alias("bucket_date"),
        *group_cols,
        *aggs.keys(),
    )


def continuous_rollup(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str,
    window_duration: str,
    aggs: dict[str, Column],
    group_cols: tuple[str, ...] = (),
    allowed_lateness: str = "0 seconds",
    fmt: str = "parquet",
    trigger: dict | None = None,
):
    """Start the continuous-aggregate maintenance query.

    Returns the running StreamingQuery; the rollup table at ``path``
    is readable at any time with :func:`read_rollup`.
    """
    from scio_db_spark.sinks.files import idempotent_batch_writer

    plan = rollup_plan(
        stream_df, ts_col, window_duration, aggs, group_cols,
        allowed_lateness,
    )
    write = idempotent_batch_writer(
        path, fmt=fmt, partition_cols=["bucket_date"]
    )
    writer = (
        plan.writeStream.outputMode("append")
        .foreachBatch(write)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def read_rollup(spark, path: str, fmt: str = "parquet") -> DataFrame:
    """The rollup table; filter on ``bucket_date`` for partition-pruned
    range scans (drop the bookkeeping ``epoch`` column)."""
    df = spark.read.format(fmt).load(path)
    return df.drop("epoch")
