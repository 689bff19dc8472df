"""Table catalog over the synthetic parquet test data.

Loads the driver-generated TPC-H-ish star schema + events/documents/
embeddings tables (TESTDATA.md). Scans are plain ``spark.read.parquet``
so Catalyst gets predicate pushdown + column pruning on every query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-TZ TIMESTAMP.

    The driver's parquet stores timestamps as ``timestamp[us]`` with
    ``isAdjustedToUTC=false``, which Spark 4.x reads as TIMESTAMP_NTZ.
    Downstream plans rely on TIMESTAMP(ltz) semantics (``unix_micros``,
    ``cast(... as double)``), which NTZ rejects. The session timezone is
    pinned to UTC (session.py), so the NTZ→LTZ cast is value-preserving.
    """
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns(
            {c: F.col(c).cast("timestamp") for c in ntz_cols}
        )
    return df


def _pin_session(spark: SparkSession) -> None:
    """Pin the confs every catalog read depends on — on EVERY call.

    - UTC session TZ: the NTZ→LTZ normalization below is
      value-preserving ONLY under UTC. SessionFactory pins this, but
      the driver gate runs a BARE SparkSession — pin at the boundary so
      the oracle comparison never shifts timestamps on a non-UTC host.
    - legacy nanosAsLong: older testdata drops store TIMESTAMP(NANOS).

    Deliberately NOT cached: a caller flipping the session TZ between
    reads must be re-corrected, and two conf RPCs per table() call are
    noise (~0.5 ms each) next to any real scan.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _pin_session(spark)
    if name == "events":
        # Older driver drops stored ts as parquet TIMESTAMP(NANOS),
        # which Spark's vectorized reader rejects; _pin_session set
        # nanosAsLong so it reads as bigint, truncated to micros here —
        # exactly what DuckDB does when it reads TIMESTAMP_NS. Newer
        # drops store timestamp[us] (NTZ); _normalize_timestamps handles
        # those uniformly for every table.
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return _normalize_timestamps(df)
    return _normalize_timestamps(
        spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    )


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
