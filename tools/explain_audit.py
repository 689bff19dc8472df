"""Plan-hygiene audit: every registered query's physical plan, greppable.

Builds (does NOT execute) each query in the registry at the given sf
dir and scans its formatted plan for scale anti-patterns:

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` — joins that
  materialize cross products. Always a bug at 100 TB unless one side
  is a literal handful of rows (whitelisted per query).
- ``Exchange SinglePartition`` — a full-data global funnel. Legitimate
  only when the funneled frame is provably tiny (global scalar aggs,
  final LIMIT collection, per-partition offset frames) — whitelisted
  where audited by hand.
- ``BatchEvalPython`` — row-at-a-time Python UDF in the plan. The
  engine's contract is Column exprs / Arrow-batched Pandas only.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
Exit 1 if any un-whitelisted flag fires, listing query + pattern.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scio_db_spark.plans.explain import plan_string
from scio_db_spark.plans.registry import all_queries
from scio_db_spark.session import SessionFactory

# (query, pattern) pairs audited by hand — each entry documents WHY the
# pattern is safe there.
WHITELIST: set[tuple[str, str]] = {
    # Global scalar aggregate: one row crosses the exchange.
    ("q06_forecast_revenue", "Exchange SinglePartition"),
    ("q17_small_quantity_revenue", "Exchange SinglePartition"),
    ("q19_disjunctive_revenue", "Exchange SinglePartition"),
    # Scalar max broadcast to the revenue frame: one row.
    ("q15_top_supplier", "Exchange SinglePartition"),
    # stats frame = ONE row (sum, count) cross-joined as the threshold.
    ("q22_dormant_rich_customers", "Exchange SinglePartition"),
    ("q22_dormant_rich_customers", "BroadcastNestedLoopJoin"),
    # Brute-force baseline BY DESIGN: 5 query vectors broadcast against
    # the table (the scale path is emb_ann_lsh_topk's bucket equi-join).
    ("emb_cosine_topk", "BroadcastNestedLoopJoin"),
    # IVF assignment: the broadcast side is the tiny coarse-centroid /
    # probe-cell frame; each row scans centroids, never other rows.
    ("emb_ann_ivf_topk", "BroadcastNestedLoopJoin"),
    # K-means assignment: the broadcast side is the k=8 seed-centroid
    # frame (constant, not SF-scaling); every vector scans 8 centroid
    # rows map-side — the correct plan for a constant build side.
    ("emb_kmeans_assign", "BroadcastNestedLoopJoin"),
    # Final ordered LIMIT: rows after limit pushdown = k.
    ("q03_shipping_priority", "Exchange SinglePartition"),
    ("q18_large_volume_customers", "Exchange SinglePartition"),
    ("topk_customers_by_revenue", "Exchange SinglePartition"),
    ("docs_ngram_jaccard_topk", "Exchange SinglePartition"),
    ("docs_token_df_topk", "Exchange SinglePartition"),
    ("emb_cosine_topk", "Exchange SinglePartition"),
    ("emb_ann_lsh_topk", "Exchange SinglePartition"),
    ("emb_ann_ivf_topk", "Exchange SinglePartition"),
}

FLAGS = (
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "Exchange SinglePartition",
    "BatchEvalPython",
)


def audit(sf_dir: str, only: set[str]) -> int:
    spark = SessionFactory.create("explain-audit")
    failures: list[tuple[str, str]] = []
    for name, spec in sorted(all_queries().items()):
        if only and name not in only:
            continue
        try:
            df = spec.spark(spark, sf_dir)
            plan = plan_string(df)
        except Exception as e:  # build errors surface in the oracle gate
            print(f"SKIP {name}: {e}")
            continue
        hits = [f for f in FLAGS if f in plan]
        bad = [f for f in hits if (name, f) not in WHITELIST]
        status = "FLAG" if bad else ("ok* " if hits else "ok  ")
        detail = ", ".join(bad or hits)
        print(f"{status} {name}" + (f": {detail}" if detail else ""))
        failures.extend((name, f) for f in bad)
    if failures:
        print(f"\n{len(failures)} un-whitelisted plan flags")
        return 1
    print("\nall plans clean (ok* = whitelisted, audited by hand)")
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(audit(sf, set(sys.argv[2:])))
