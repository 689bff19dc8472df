"""Engine CLI: run any registered query by name.

Usage:
  python tools/run_query.py <query> [--sf DIR] [--show N] [--explain]
  python tools/run_query.py --list

Examples:
  python tools/run_query.py q01_pricing_summary --show 10
  python tools/run_query.py events_asof_latest_order --explain
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from scio_db_spark.plans.registry import all_queries
from scio_db_spark.session import SessionFactory


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--show", type=int, default=20)
    ap.add_argument(
        "--explain", action="store_true", help="print the formatted plan"
    )
    ap.add_argument(
        "--list", action="store_true", help="list queries and docs"
    )
    args = ap.parse_args()
    qs = all_queries()
    if args.list or not args.query:
        for name, spec in sorted(qs.items()):
            mark = "*" if spec.headline else " "
            print(f"{mark} {name}: {spec.doc.split('.')[0]}.")
        return 0
    if args.query not in qs:
        ap.error(
            f"unknown query {args.query!r} — run with --list to see all"
        )
    spark = SessionFactory.create("run-query")
    df = qs[args.query].spark(spark, args.sf)
    if args.explain:
        from scio_db_spark.plans.explain import plan_string

        print(plan_string(df))
    df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
