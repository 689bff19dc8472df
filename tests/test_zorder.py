"""Z-order clustering: multi-column row-group pruning, measured from
the actual parquet footer statistics (deterministic — no timings)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from scio_db_spark.sinks.maintenance import _parquet_files, compact


def _groups_containing(path: str, col: str, value) -> tuple[int, int]:
    """(row groups whose [min,max] contains value, total row groups)
    across every parquet file under path — exactly the stats a reader
    uses to skip."""
    import pyarrow.parquet as pq

    hit = total = 0
    for f in _parquet_files(path):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            total += 1
            if st is None or (st.min <= value <= st.max):
                hit += 1
    return hit, total


def _write_table(spark, path: str, n=200_000):
    # two INDEPENDENT uniform columns: lexicographic order on (x, y)
    # leaves y unordered globally, the worst case for y-stat pruning
    spark.range(n).select(
        (F.xxhash64("id") % 1000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("y"),
        F.col("id").alias("payload"),
    ).repartition(8).write.mode("overwrite").parquet(path)


def test_zorder_prunes_on_every_participating_column(spark, tmp_path):
    lex = str(tmp_path / "lex")
    zord = str(tmp_path / "zord")
    _write_table(spark, lex)
    _write_table(spark, zord)
    # small target so the rewrite yields many files/row groups
    compact(spark, lex, target_bytes=64 * 1024, sort_by=["x", "y"])
    compact(spark, zord, target_bytes=64 * 1024, zorder_by=["x", "y"])

    probe = 500
    # leading column: both layouts prune well
    lex_x, total_lex = _groups_containing(lex, "x", probe)
    z_x, total_z = _groups_containing(zord, "x", probe)
    assert total_lex >= 8 and total_z >= 8
    assert lex_x <= total_lex / 2
    assert z_x <= total_z / 2
    # trailing column: lexicographic stats are useless (every group
    # spans y's range), z-order keeps pruning
    lex_y, _ = _groups_containing(lex, "y", probe)
    z_y, _ = _groups_containing(zord, "y", probe)
    assert lex_y >= total_lex * 0.9, (
        f"test premise broken: lexicographic y-stats pruned "
        f"{total_lex - lex_y}/{total_lex}"
    )
    assert z_y <= total_z / 2, (
        f"z-order did not prune on y: {z_y}/{total_z} groups contain "
        f"{probe}"
    )


def test_zorder_rewrite_is_lossless(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_table(spark, path, n=20_000)
    before = spark.read.parquet(path).groupBy().agg(
        F.count(F.lit(1)), F.sum("payload"), F.sum("x"), F.sum("y")
    ).collect()[0]
    stats = compact(
        spark, path, target_bytes=64 * 1024, zorder_by=["x", "y"]
    )
    assert stats["rows"] == 20_000
    after = spark.read.parquet(path).groupBy().agg(
        F.count(F.lit(1)), F.sum("payload"), F.sum("x"), F.sum("y")
    ).collect()[0]
    assert tuple(before) == tuple(after)
    # the helper column never reaches the files
    assert "__z" not in spark.read.parquet(path).columns


def test_z_value_bit_budget_guard():
    import pytest

    from scio_db_spark.functions.zorder import z_value

    with pytest.raises(ValueError, match="does not fit"):
        z_value([F.lit(1)] * 8, bits=12)  # 96 bits
    with pytest.raises(ValueError, match="at least one"):
        z_value([], bits=12)


def test_zorder_guards_and_edge_inputs(spark, tmp_path):
    import pytest

    from pyspark.sql import functions as F

    from scio_db_spark.functions.zorder import with_z_order

    df = spark.range(10).select(
        F.col("id").alias("x"),
        F.lit("s").alias("name"),
        F.lit(None).cast("long").alias("all_null"),
        F.to_date(F.lit("2024-01-01")).alias("d"),
    )
    with pytest.raises(ValueError, match="ordered grid"):
        with_z_order(df, ["name"])
    # all-NULL column degrades to constant cell; date maps via day
    # number — both produce a non-NULL z for every row
    z = with_z_order(df, ["x", "all_null", "d"])
    assert z.filter(F.col("__z").isNull()).count() == 0
