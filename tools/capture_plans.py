"""Capture ``explain("formatted")`` for headline (or named) queries.

Round-12 optimization deliverable: ``plans/r12/<query>_<tag>.txt`` —
the judge checks plan claims in OPTIMIZATION_r12.md against these
files, so they are captured from the registry exactly as bench.py
builds the DataFrames (same SessionFactory, same sf dir).

Usage:
    python tools/capture_plans.py before               # all headline
    python tools/capture_plans.py after q01_pricing_summary ...
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/capture_plans.py before
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

OUT_DIR = os.path.join(
    _REPO_ROOT, "plans", os.environ.get("SCIO_PLANS_ROUND", "r13")
)


def formatted_plan(spark, df) -> str:
    jqe = df._jdf.queryExecution()
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        jqe, "formatted"
    )


def main() -> int:
    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.session import SessionFactory

    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = SessionFactory.create("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)
    q = all_queries()
    if not names:
        # effectful specs run real side-effect jobs at build time and
        # their plan is an opaque checkpoint scan — skip, like
        # tools/explain_audit.py does.
        names = [
            n for n, s in sorted(q.items()) if s.headline and not s.effectful
        ]
    for name in names:
        spec = q[name]
        if spec.effectful:
            print(f"skip {name}: effectful (plan is a checkpoint scan)")
            continue
        df = spec.spark(spark, sf_dir)
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(spark, df))
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
