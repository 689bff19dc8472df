"""Semantic invariants for the corpusops + tpch_fill + semdedup queries.

The DuckDB oracle (tools/check_oracle.py) pins exact values at sf0.01;
these tests pin the *invariants* that make the answers meaningful, at
sf0.001 so the suite stays fast, plus plan-shape assertions for the
scale properties the docstrings claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from scio_db_spark.plans.explain import plan_string
from scio_db_spark.plans.registry import all_queries


def _q(name, spark, sf_dir):
    return all_queries()[name].spark(spark, sf_dir)


# ------------------------------------------------------------- corpus ops
def test_unigram_surprisal_invariants(spark, sf_dir):
    rows = _q("docs_unigram_surprisal", spark, sf_dir).collect()
    assert rows
    for r in rows:
        # bitlen(N) >= bitlen(cnt) for every token, so bits are >= 0
        # and <= n_tokens * bitlen(N) (N fits far under 2^63).
        assert 0 <= r.surprisal_bits
        assert r.mean_millibits == r.surprisal_bits * 1000 // r.n_tokens
        assert r.n_tokens > 0


def test_unigram_surprisal_ranks_rare_tokens_higher(spark, sf_dir):
    """A document of corpus-rare tokens must out-score a document of
    corpus-common tokens — the property a quality gate filters on."""
    df = _q("docs_unigram_surprisal", spark, sf_dir)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    from collections import Counter

    counts = Counter(
        w for d in docs for w in d.text.lower().split() if w
    )
    total = sum(counts.values())
    mean_by_doc = {r.doc_id: r.mean_millibits for r in df.collect()}

    def exact_mean_millibits(text):
        toks = [w for w in text.lower().split() if w]
        bits = sum(
            total.bit_length() - counts[w].bit_length() for w in toks
        )
        return bits * 1000 // len(toks)

    for d in docs[:50]:
        assert mean_by_doc[d.doc_id] == exact_mean_millibits(d.text)


def test_vocab_coverage_invariants(spark, sf_dir):
    rows = _q("docs_vocab_coverage", spark, sf_dir).collect()
    assert rows
    assert any(r.n_oov > 0 for r in rows), "OOV signal is degenerate"
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert r.oov_permille == r.n_oov * 1000 // r.n_tokens


def test_bigram_colloc_bounds(spark, sf_dir):
    rows = _q("docs_bigram_colloc_topk", spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        # A bigram cannot occur more often than either of its words.
        assert r.c_xy <= r.c_x
        assert r.c_xy <= r.c_y
        assert len(r.bigram.split(" ")) == 2


def test_semantic_dedup_pairs_within_cluster(spark, sf_dir):
    df = _q("emb_semantic_dedup", spark, sf_dir)
    rows = df.collect()
    for r in rows:
        assert r.vec_a < r.vec_b
        assert r.cos_sim >= 0.3
    # Cluster ids come from the k=8 seed centroids.
    assert all(0 <= r.cluster < 8 for r in rows)


# ------------------------------------------------------------ TPC-H fill
def test_q02_picks_group_minimum(spark, sf_dir):
    rows = _q("q02_min_cost_supplier", spark, sf_dir).collect()
    if not rows:  # sf0.001 may filter everything out; oracle covers sf0.01
        return
    best: dict[int, float] = {}
    for r in rows:
        best.setdefault(r.p_partkey, r.supply_cost)
        # every surviving row per part carries the identical min cost
        assert best[r.p_partkey] == r.supply_cost


def test_q21_counts_sole_late_supplier_orders(spark, sf_dir):
    """Cross-check q21 on a recompute: per (order, supplier) lateness,
    keep late-and-sole-late multi-supplier orders."""
    df = _q("q21_suppliers_kept_waiting", spark, sf_dir)
    got = {(r.s_name, r.numwait) for r in df.collect()}

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
        F.col("n_name") == "NATION_3"
    )
    import collections

    od = {r.o_orderkey: r.o_orderdate for r in o.collect()}
    latest: dict[tuple, object] = {}
    for r in l.collect():
        k = (r.l_orderkey, r.l_suppkey)
        if k[0] in od and (k not in latest or r.l_shipdate > latest[k]):
            latest[k] = r.l_shipdate
    import datetime

    per_order = collections.defaultdict(list)
    for (okey, skey), ship in latest.items():
        late = ship > od[okey] + datetime.timedelta(days=45)
        per_order[okey].append((skey, late))
    nat_keys = {r.n_nationkey for r in n.collect()}
    name_of = {
        r.s_suppkey: r.s_name
        for r in s.collect()
        if r.s_nationkey in nat_keys
    }
    waits = collections.Counter()
    for okey, supps in per_order.items():
        lates = [skey for skey, late in supps if late]
        if len(supps) > 1 and len(lates) == 1 and lates[0] in name_of:
            waits[name_of[lates[0]]] += 1
    expect = sorted(
        waits.items(), key=lambda kv: (-kv[1], kv[0])
    )[:25]
    assert got == set(expect)


def test_new_plans_free_of_scale_antipatterns(spark, sf_dir):
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "tools"
        ),
    )
    from explain_audit import FLAGS, WHITELIST

    qs = all_queries()
    bad = []
    for name in (
        "q02_min_cost_supplier",
        "q09_product_profit",
        "q11_important_stock",
        "q12_late_lines_by_status",
        "q16_supplier_part_counts",
        "q20_excess_share_suppliers",
        "q21_suppliers_kept_waiting",
        "docs_unigram_surprisal",
        "docs_bigram_colloc_topk",
        "docs_vocab_coverage",
        "emb_semantic_dedup",
    ):
        plan = plan_string(qs[name].spark(spark, sf_dir))
        bad.extend(
            (name, f)
            for f in FLAGS
            if f in plan and (name, f) not in WHITELIST
        )
    assert not bad, bad


def test_colloc_topk_avoids_global_sort_exchange(spark, sf_dir):
    """The rank-limit window must be rewritten into a distributed
    top-k (TakeOrderedAndProject, or WindowGroupLimit for grouped
    forms), not a single-partition global sort of the bigram table."""
    plan = plan_string(
        _q("docs_bigram_colloc_topk", spark, sf_dir)
    )
    assert (
        "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan
    )
    assert "SinglePartition" not in plan
