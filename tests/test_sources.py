"""Source reader tests (SURVEY.md §2.1 S3/S4, §2.4 F5)."""

from __future__ import annotations

from datetime import date

from pyspark.sql import Row

from scio_db_spark.sources.readers import (
    read_date_partitioned,
    read_files,
)


def test_date_partitioned_probe_and_union(spark, tmp_path):
    # Three of the last five date dirs exist; one is empty (skipped —
    # the F5 contract: only dirs that exist AND contain data files).
    base = tmp_path / "hist"
    today = date(2024, 1, 10)
    for d, n in (("2024/01/10", 2), ("2024/01/09", 3), ("2024/01/07", 1)):
        p = base / d
        spark.createDataFrame(
            [Row(k=f"{d}-{i}") for i in range(n)]
        ).write.parquet(str(p))
    (base / "2024" / "01" / "08").mkdir(parents=True)  # exists, empty

    df = read_date_partitioned(
        spark, str(base), days=5, today=today
    )
    assert df is not None
    assert df.count() == 6  # 2 + 3 + 1, one scan over 3 paths
    # S4 returns None when nothing exists (caller skips initial load).
    assert read_date_partitioned(
        spark, str(tmp_path / "nothing"), days=3, today=today
    ) is None


def test_read_files_glob(spark, tmp_path):
    p = tmp_path / "glob"
    spark.createDataFrame([Row(v=1), Row(v=2)]).write.parquet(str(p / "a"))
    spark.createDataFrame([Row(v=3)]).write.parquet(str(p / "b"))
    df = read_files(spark, [str(p / "a"), str(p / "b")])
    assert df.count() == 3


def test_catalog_pins_utc_session(spark, sf_dir):
    """The NTZ→LTZ normalization in catalog.table is value-preserving
    only under UTC — table() must re-pin it even if the session (e.g.
    the driver's bare one) was configured otherwise."""
    from scio_db_spark.plans.catalog import table

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert dict(df.dtypes)["ts"] == "timestamp"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_mock_bers_seed_is_partitioning_independent(spark):
    """Seeded amounts must be identical regardless of partition layout
    (F.rand(seed) is only per-partition deterministic) — compared
    against the hash formula evaluated on a DIFFERENTLY-partitioned
    frame, which a rand()-based implementation cannot match."""
    from pyspark.sql import functions as F

    from scio_db_spark.sources.mockdata import mock_bers

    got = {
        int(r.notification_id[1:]): r.amount
        for r in mock_bers(spark, 100, seed=42).collect()
    }
    expect = {
        r.id: r.amount
        for r in spark.range(100)
        .repartition(13)  # deliberately different layout
        .select(
            "id",
            (
                F.pmod(F.xxhash64(F.col("id"), F.lit(42)), F.lit(10_000))
                / 10_000.0
                * 100.0
            ).alias("amount"),
        )
        .collect()
    }
    assert got == expect


def test_date_partitioned_schema_drift_merge(spark, tmp_path):
    """A column added mid-window exists only in newer dirs: with
    merge_schema the load carries it (older days NULL-backfilled);
    the default sample-footer read either drops it or errors — the
    silent-drop case is exactly why the flag exists."""
    from pyspark.sql import functions as F

    base = tmp_path / "drift"
    today = date(2024, 1, 10)
    spark.createDataFrame([Row(k="old-1")]).write.parquet(
        str(base / "2024/01/09")
    )
    spark.createDataFrame([Row(k="new-1", extra=42)]).write.parquet(
        str(base / "2024/01/10")
    )
    merged = read_date_partitioned(
        spark, str(base), days=5, today=today, merge_schema=True
    )
    assert set(merged.columns) == {"k", "extra"}
    rows = {r.k: r.extra for r in merged.collect()}
    assert rows == {"old-1": None, "new-1": 42}
    # pinned-schema form: same result without footer merging
    pinned = read_date_partitioned(
        spark, str(base), days=5, today=today, schema="k string, extra long"
    )
    assert {r.k: r.extra for r in pinned.collect()} == rows
