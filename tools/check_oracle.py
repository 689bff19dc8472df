"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB
against the same sf dir, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their string representation) — approximating CORRECTNESS_r{N}.json.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

from scio_db_spark.plans.catalog import TABLES
from scio_db_spark.plans.registry import all_queries
from scio_db_spark.session import SessionFactory


def value_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    for c in cols:
        # Render floats with full precision so bit-identical doubles match.
        d[c] = d[c].map(
            lambda v: repr(float(v)) if isinstance(v, float) else str(v)
        )
    rows = sorted(
        "\x01".join(str(v) for v in rec) for rec in d.itertuples(index=False)
    )
    return hashlib.md5("\x02".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = SessionFactory.create("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = []
    # ALL DuckDB oracles run FIRST, while the JVM is still small: a
    # 100+-query sweep grows the driver JVM past vm.max_map_count
    # (whole-stage-codegen classes each cost mappings), after which
    # DuckDB's allocator fails tiny blocks with "Out of Memory Error"
    # — observed twice at the default 65530 cap. Running the pure-C++
    # side up front removes the ordering hazard entirely.
    duck_results: dict[str, object] = {}
    for name, spec in sorted(all_queries().items()):
        if (only and name not in only) or spec.oracle is None:
            continue
        try:
            duck_results[name] = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001 — recorded per-query
            # Transient co-residency starvation guard: a DuckDB
            # "Out of Memory ... bad allocation" on this shared box is
            # almost always ANOTHER process's teardown still holding
            # RAM (observed live in round 10: a 275MB/0.9s oracle
            # failed a 16KB block seconds after a big pytest suite
            # exited — the same environmental mode as the round-9
            # driver artifact). One bounded backoff retry separates
            # that from a real repo defect; the retry is printed so a
            # green-after-retry row is never silent.
            if "Out of Memory" in str(e) or "bad allocation" in str(e):
                import time as _time

                print(
                    f"RETRY {name}: transient DuckDB OOM "
                    f"({str(e)[:80]}); backing off 15s",
                )
                _time.sleep(15)
                try:
                    duck_results[name] = con.execute(
                        spec.oracle
                    ).fetchdf()
                    continue
                except Exception as e2:  # noqa: BLE001
                    duck_results[name] = e2
                    continue
            duck_results[name] = e
    for name, spec in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            sdf = spec.spark(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"okNA {name}: rows={len(spark_pd)} (no oracle, rows-only)")
            continue
        duck_pd = duck_results[name]
        if isinstance(duck_pd, Exception):
            print(f"FAIL {name}: duckdb error: {duck_pd}")
            failures.append(name)
            continue
        problems = []
        if len(spark_pd) != len(duck_pd):
            problems.append(f"rows {len(spark_pd)} != {len(duck_pd)}")
        if sorted(spark_pd.columns) != sorted(duck_pd.columns):
            problems.append(
                f"cols {sorted(spark_pd.columns)} != {sorted(duck_pd.columns)}"
            )
        if not problems:
            h1, h2 = value_hash(spark_pd), value_hash(duck_pd)
            if h1 != h2:
                problems.append("value-hash mismatch")
                # Best-effort hint only: mixed dtypes (e.g. an all-NULL
                # object column vs float64) make merge() itself raise —
                # a hint failure must not kill the remaining queries.
                try:
                    merged = spark_pd.merge(
                        duck_pd, how="outer", indicator=True,
                        on=list(spark_pd.columns),
                    )
                    diff = merged[merged["_merge"] != "both"]
                    print(diff.head(6).to_string())
                except Exception as e:  # noqa: BLE001
                    print(f"(diff hint unavailable: {e})")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"ok   {name}: rows={len(spark_pd)}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
