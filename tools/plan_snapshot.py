"""Physical-plan stability snapshots for the headline queries.

The explain audit (tools/explain_audit.py) rejects anti-patterns; this
tool pins the ACCEPTED shapes. A silent environment or code change
that flips a BroadcastHashJoin to a SortMergeJoin, inserts an extra
Exchange, or drops whole-stage codegen will not fail correctness or
the anti-pattern audit — it fails HERE, the same practice as Spark's
own PlanStabilitySuite (public Spark test infrastructure).

Signature = the ordered operator skeleton of the FORMATTED explain:
every "(N) Operator" line (codegen ids stripped — codegen id NUMBERING
shifts with unrelated plan changes; the codegen-span BOUNDARIES are
still captured because WholeStageCodegen wrapping changes the operator
list itself), with each Exchange annotated by its partitioning kind
(hashpartitioning / rangepartitioning / SinglePartition / ...). Ids,
column names, paths, and sizes are normalized away, so renames don't
churn snapshots but strategy changes do.

Usage:
    python tools/plan_snapshot.py           # verify vs snapshot file
    python tools/plan_snapshot.py --update  # regenerate snapshots

Snapshots live in tests/plan_snapshots.json (committed); the pytest
leg (tests/test_plan_stability.py) verifies them in CI posture.
"""

from __future__ import annotations

import json
import os
import re
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

SNAPSHOT_PATH = os.path.join(_REPO_ROOT, "tests", "plan_snapshots.json")
SF_DIR = "/root/testdata/sf0.01"

# The bench headline set: the queries whose physical strategy is the
# performance story (bench.py), pinned at the correctness-gate SF.
QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_region_revenue",
    "q09_product_profit",
    "q18_large_volume_customers",
    "q21_suppliers_kept_waiting",
    "basket_part_pairs_topk",
    "broadcast_enrich_orders",
    "docs_contamination_screen",
    "docs_minhash_signature",
    "docs_minhash_lsh_pairs",
    "docs_incremental_lsh_dedup",
    "docs_lsh_bucket_census",
    "docs_span_excised_corpus",
    "docs_pipeline_corpus_stats",
    "emb_cosine_topk",
    "events_anti_join_historical",
    "events_asof_latest_order",
    "events_heavy_users_exact",
    "events_top_paths",
    "events_windowed_counts",
    "global_rank_customers",
    "orders_snapshot_cdc_diff",
    # round-12 modality near-dup pairing: the exact-collapse +
    # band-self-join strategy is the scale story; the census twins
    # are map-only (no strategy to pin)
    "mm_image_neardup_pairs",
    "mm_audio_neardup_pairs",
    "mm_video_neardup_pairs",
]

_OP_RE = re.compile(r"^\(\d+\)\s+(.*?)(?:\s+\[codegen id : \d+\])?\s*$")


def plan_signature(spark, df) -> list[str]:
    """Normalized operator skeleton of the formatted physical plan."""
    jqe = df._jdf.queryExecution()
    text = spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        jqe, "formatted"
    )
    lines = text.splitlines()
    # Walk the detail headers ("(N) Operator [codegen id : x]"); for
    # Exchange, annotate with the partitioning kind from its
    # Arguments line; for Scan, keep only the format token.
    ops: list[str] = []
    for i, raw in enumerate(lines):
        m = _OP_RE.match(raw.strip())
        if not m:
            continue
        op = m.group(1)
        if op == "Exchange":
            kind = "?"
            for j in range(i + 1, min(i + 6, len(lines))):
                arg = lines[j].strip()
                if arg.startswith("Arguments:"):
                    kind = (
                        arg.split("Arguments:", 1)[1]
                        .strip()
                        .split("(")[0]
                        .split(",")[0]
                        .strip()
                    )
                    break
            ops.append(f"Exchange[{kind}]")
        elif op.startswith("Scan "):
            ops.append(" ".join(op.split()[:2]))  # e.g. "Scan parquet"
        else:
            ops.append(op)
    return ops


def build(spark) -> dict[str, list[str]]:
    from scio_db_spark.plans.registry import all_queries

    q = all_queries()
    return {
        name: plan_signature(spark, q[name].spark(spark, SF_DIR))
        for name in QUERIES
    }


def main() -> int:
    from scio_db_spark.session import SessionFactory

    spark = SessionFactory.create("plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    current = build(spark)
    if "--update" in sys.argv:
        with open(SNAPSHOT_PATH, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
        print(f"wrote {len(current)} snapshots -> {SNAPSHOT_PATH}")
        return 0
    with open(SNAPSHOT_PATH) as f:
        pinned = json.load(f)
    bad = []
    for name, sig in current.items():
        if pinned.get(name) != sig:
            bad.append(name)
            print(f"PLAN DRIFT {name}:")
            print(f"  pinned : {pinned.get(name)}")
            print(f"  current: {sig}")
    print(f"{len(bad)} drifted of {len(current)}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
