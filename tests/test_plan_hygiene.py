"""Plan-hygiene regression tests (tools/explain_audit.py as a gate).

Runs the anti-pattern audit over a representative subset of the
registry at sf0.001 — cartesian products, full-data single-partition
exchanges, and row-at-a-time Python UDFs must not appear in these
plans. The full sweep is `python tools/explain_audit.py`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from explain_audit import FLAGS, WHITELIST  # noqa: E402

from scio_db_spark.plans.explain import plan_string  # noqa: E402
from scio_db_spark.plans.registry import all_queries  # noqa: E402

SUBSET = [
    "q01_pricing_summary",
    "q05_region_revenue",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "global_rank_customers",
    "docs_minhash_lsh_pairs",
    "docs_repetition_signals",
    "events_asof_latest_order",
    "emb_ann_lsh_topk",
    "docs_lang_rebalance",
]


def test_lang_rebalance_plans_single_broadcast_join(spark, sf_dir):
    """docs_lang_rebalance must plan exactly one join touching the data:
    a BroadcastHashJoin on lang. The global-min fold is a window
    aggregate over the ~|langs|-row counts frame, never a nested-loop
    join (a constant-key equi-join folds back into BNLJ)."""
    df = all_queries()["docs_lang_rebalance"].spark(spark, sf_dir)
    plan = plan_string(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_plans_free_of_scale_antipatterns(spark, sf_dir):
    qs = all_queries()
    bad = []
    for name in SUBSET:
        df = qs[name].spark(spark, sf_dir)
        plan = plan_string(df)
        bad.extend(
            (name, f)
            for f in FLAGS
            if f in plan and (name, f) not in WHITELIST
        )
    assert bad == []


def test_whitelisted_singlepartition_flag_actually_fires(spark, sf_dir):
    """Pins the detector itself: global_rank_customers' prefix-offset
    window IS a SinglePartition exchange (one row per partition — the
    audited-safe form), so the bare "SinglePartition" token must both
    be a FLAGS member and match the formatted plan. Round 3 shipped a
    dead "Exchange SinglePartition" two-word flag that never matched
    formatted-mode output (node name and Arguments render on separate
    lines); this test fails if the token or Spark's plan rendering
    drifts so the audit gate can't silently die again."""
    assert "SinglePartition" in FLAGS
    assert ("global_rank_customers", "SinglePartition") in WHITELIST
    df = all_queries()["global_rank_customers"].spark(spark, sf_dir)
    assert "SinglePartition" in plan_string(df)
