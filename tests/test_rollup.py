"""Continuous-aggregate contract tests (streaming/rollup.py).

Pins the hypertable-rollup semantics: buckets finalize exactly once
after the watermark passes, late rows inside the lateness bound still
count, the table partitions by bucket_date, and the batch form of the
same plan matches a plain groupBy — so the streaming maintenance path
computes the oracle-checked aggregate.
"""

from __future__ import annotations

import datetime
import glob
import os
import time

from pyspark.sql import Row
from pyspark.sql import functions as F

from scio_db_spark.streaming.rollup import (
    continuous_rollup,
    read_rollup,
    rollup_plan,
)

SCHEMA = "user_id long, value double, ts timestamp"


def _row(uid, v, iso):
    return Row(
        user_id=uid, value=v, ts=datetime.datetime.fromisoformat(iso)
    )


def test_rollup_plan_batch_matches_plain_aggregate(spark):
    rows = [
        _row(1, 1.0, "2024-01-01T00:00:10"),
        _row(1, 2.0, "2024-01-01T00:00:20"),
        _row(2, 5.0, "2024-01-01T00:01:10"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = rollup_plan(
        df, "ts", "1 minute",
        {"n": F.count(F.lit(1)), "total": F.sum("value")},
        group_cols=("user_id",),
    )
    got = {
        (r.bucket_start.isoformat(), r.user_id): (r.n, r.total)
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01T00:00:00", 1): (2, 3.0),
        ("2024-01-01T00:01:00", 2): (1, 5.0),
    }
    assert all(r.bucket_date == "2024-01-01" for r in out.collect())


def test_continuous_rollup_finalizes_once_and_prunes(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    table = str(tmp_path / "rollup")

    def drop_batch(rows, name):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    # bucket A rows arrive across two files; a later event closes A
    drop_batch([_row(1, 1.0, "2024-01-01T00:00:10")], "b1")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    q = continuous_rollup(
        stream, table, str(tmp_path / "ck"),
        ts_col="ts", window_duration="1 minute",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
        group_cols=("user_id",),
    )
    try:
        q.processAllAvailable()
        drop_batch([_row(1, 2.0, "2024-01-01T00:00:40")], "b2")
        q.processAllAvailable()
        # bucket A is still open (watermark hasn't passed its end):
        # nothing finalized yet
        files = glob.glob(os.path.join(table, "**", "*.parquet"),
                          recursive=True)
        a_rows = (
            read_rollup(spark, table).collect() if files else []
        )
        assert a_rows == []
        # an event far in the future closes bucket A
        drop_batch([_row(9, 0.0, "2024-01-01T02:00:00")], "b3")
        q.processAllAvailable()
        out = read_rollup(spark, table).collect()
        assert len(out) == 1  # exactly once, fully aggregated
        (r,) = out
        assert (r.user_id, r.n, r.total) == (1, 2, 3.0)
        # partition discovery infers the dir value back as a DATE
        assert str(r.bucket_date) == "2024-01-01"
    finally:
        q.stop()
    # bucket_date partition dirs exist for pruned range scans
    assert any(
        "bucket_date=2024-01-01" in d
        for d, _, _ in os.walk(table)
    )


def test_rollup_read_prunes_partitions_at_hourly_grain(spark, tmp_path):
    """SCALE.md claim, pinned: a date-range predicate on the rollup
    table reaches the scan as a PartitionFilter on bucket_date — the
    reader scans one day's partition directories, not the table. Uses
    a second grain (hourly) than the streaming test (30s) so the
    bucket_date partitioning is exercised with many buckets per
    partition."""
    from scio_db_spark.plans.explain import plan_string

    table = str(tmp_path / "rollup_hourly")
    rows = [
        _row(1, 1.0, "2024-01-01T00:10:00"),
        _row(1, 2.0, "2024-01-01T05:20:00"),
        _row(2, 4.0, "2024-01-02T03:30:00"),
        _row(2, 8.0, "2024-01-03T07:40:00"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    plan = rollup_plan(
        df, "ts", "1 hour",
        {"n": F.count(F.lit(1)), "total": F.sum("value")},
        group_cols=("user_id",),
    )
    plan.write.partitionBy("bucket_date").parquet(table)

    filtered = read_rollup(spark, table).filter(
        (F.col("bucket_date") >= "2024-01-02")
        & (F.col("bucket_date") < "2024-01-03")
    )
    txt = plan_string(filtered)
    pf_lines = [
        ln for ln in txt.splitlines() if "PartitionFilters" in ln
    ]
    assert pf_lines, txt
    assert any("bucket_date" in ln for ln in pf_lines), pf_lines
    # the predicate must NOT degrade to a post-scan data filter only:
    # the partition filter line carries both range bounds
    assert any(">=" in ln and "<" in ln for ln in pf_lines), pf_lines

    out = filtered.collect()
    assert len(out) == 1
    assert (out[0].user_id, out[0].n, out[0].total) == (2, 1, 4.0)
    assert str(out[0].bucket_start) == "2024-01-02 03:00:00"
