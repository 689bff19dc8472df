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


# Catalog-level table memo (round-12 optimization): one ANALYZED
# DataFrame per (session, sf_dir, table, spread) for the life of the
# session — the same contract ``spark.table`` gives via the session
# catalog's relation/file-index cache. ``spark.read.parquet`` is NOT
# cached by Spark: every call re-resolves the DataSource, re-lists the
# path and re-reads the parquet footer (~0.2 s warm on this repo's
# tables), and bench.py rebuilds every query per measured pass, so an
# n-table query paid n re-resolutions per pass. Memoizing the LAZY
# plan object removes that; no DATA is ever cached (no persist — every
# action still scans parquet end to end), so bench/oracle runs keep
# computing from the input files. The session object itself is kept in
# the value, which both prevents id() reuse after GC and keeps the
# memo valid for the session's lifetime.
_TABLE_MEMO: dict[tuple[int, str, str, bool], tuple[SparkSession, DataFrame]] = {}

#: Spread gate: repartition a scan for CPU-dense per-row compute only
#: when the WHOLE table is smaller than this many bytes per available
#: core — i.e. the input's own file/row-group layout cannot feed the
#: cluster. Production tables (many files, row-group-sized splits)
#: never trip the gate, so no full-data shuffle is ever added at
#: scale; the driver's single-file bench inputs do (a 0.6 MB corpus
#: on 32 cores otherwise tokenizes on ONE task). Parameterised per
#: the scale-adaptivity rule; see OPTIMIZATION_r12.md.
_SPREAD_BYTES_PER_CORE = int(
    os.environ.get("SCIO_SPREAD_BYTES_PER_CORE", str(4 * 1024 * 1024))
)

#: Spread WIDTH is derived from the data, not pinned to the core
#: count: width = clamp(table_bytes / this, 2, defaultParallelism).
#: Rationale (round-12 measurement): every task costs a serialized
#: launch overhead c on the driver (~15-25 ms on the bench boxes —
#: a 32-task stage has a ~0.5 s wall floor with ZERO work in it), so
#: for a stage doing W seconds of real compute the optimal task count
#: is ~sqrt(W/c), not "all cores". 64 KiB of this corpus ≈ one task's
#: worth of tokenize/shingle/hash work at that optimum (interleaved
#: A/B: width 8 beat width 32 by 15-30% on the docs/emb headline
#: queries at sf0.1). The clamp keeps it scale-adaptive: bigger
#: inputs widen toward all cores, the cores cap keeps the driver's
#: low-CPU scaling runs honest, and production tables never reach
#: here (byte gate above).
_SPREAD_TARGET_BYTES_PER_TASK = int(
    os.environ.get("SCIO_SPREAD_TARGET_BYTES_PER_TASK", str(64 * 1024))
)


def _table_bytes(path: str) -> int:
    if os.path.isdir(path):
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return os.path.getsize(path)


def table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    spread_for_compute: bool = False,
) -> DataFrame:
    """Catalog read. ``spread_for_compute=True`` marks the caller as
    CPU-dense per row (tokenization, vector math, codec work): when
    the table's file layout yields fewer input splits than the session
    has cores (single small file — the bench corpus shape), the scan
    is round-robin repartitioned to a data-derived width (see
    ``_SPREAD_TARGET_BYTES_PER_TASK``) so the expensive map work
    spreads without paying all-cores task-launch overhead. The
    repartition only ever moves column-pruned rows (Catalyst pushes
    the projection below the exchange), is deterministic under retry
    (sort-before-repartition stays on), and is a no-op at production
    scale via the byte gate above."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _pin_session(spark)
    key = (id(spark), os.path.abspath(sf_dir), name, spread_for_compute)
    hit = _TABLE_MEMO.get(key)
    if hit is not None:
        return hit[1]
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if name == "events":
        # Older driver drops stored ts as parquet TIMESTAMP(NANOS),
        # which Spark's vectorized reader rejects; _pin_session set
        # nanosAsLong so it reads as bigint, truncated to micros here —
        # exactly what DuckDB does when it reads TIMESTAMP_NS. Newer
        # drops store timestamp[us] (NTZ); _normalize_timestamps handles
        # those uniformly for every table.
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
    df = _normalize_timestamps(df)
    if spread_for_compute:
        cores = spark.sparkContext.defaultParallelism
        nbytes = _table_bytes(path)
        if nbytes < cores * _SPREAD_BYTES_PER_CORE:
            width = max(
                2,
                min(cores, -(-nbytes // _SPREAD_TARGET_BYTES_PER_TASK)),
            )
            df = df.repartition(width)
    _TABLE_MEMO[key] = (spark, df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
