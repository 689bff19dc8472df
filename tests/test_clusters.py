"""Connected-components (dedup clustering) tests."""

from __future__ import annotations

from pyspark.sql import Row

from scio_db_spark.operators.clusters import connected_components


def test_components_chain_and_star(spark):
    # Chain 1-2-3-4 (diameter 3, needs >1 iteration) + star 10-(11,12)
    # + isolated pair 20-21.
    edges = spark.createDataFrame(
        [
            Row(src=2, dst=1),
            Row(src=3, dst=2),
            Row(src=4, dst=3),
            Row(src=10, dst=11),
            Row(src=10, dst=12),
            Row(src=21, dst=20),
        ]
    )
    got = {
        r.v: r.label for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_components_cycle(spark):
    edges = spark.createDataFrame(
        [Row(src=5, dst=6), Row(src=6, dst=7), Row(src=7, dst=5)]
    )
    got = {r.v: r.label for r in connected_components(edges).collect()}
    assert got == {5: 5, 6: 5, 7: 5}


def test_token_hll_estimate_within_rsd(spark):
    # The deterministic-register HLL is oracle-checked bit-for-bit
    # (estimates match DuckDB exactly); ACCURACY vs the exact distinct
    # count is a separate property, bounded here. rsd for m=4096 is
    # ~1.6%; 15% absorbs the n < 2.5m linear-counting / raw-HLL
    # crossover bias region at the test SF.
    from scio_db_spark.plans.textops import token_df_topk  # noqa: F401
    from scio_db_spark.plans.registry import all_queries

    sf = "/root/testdata/sf0.001"
    est = {
        r.lang: r.distinct_tokens_est
        for r in all_queries()["docs_token_hll_estimate"]
        .spark(spark, sf)
        .collect()
    }
    from scio_db_spark.functions import text as X
    from scio_db_spark.plans.catalog import table
    from pyspark.sql import functions as F

    exact = {
        r.lang: r.n
        for r in table(spark, sf, "documents")
        .select("lang", F.explode(X.tokens(F.col("text"))).alias("t"))
        .groupBy("lang")
        .agg(F.countDistinct("t").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for lang, n in exact.items():
        assert abs(est[lang] - n) <= max(3, 0.15 * n), (lang, est[lang], n)


def test_dedup_keep_canonical_composes_with_minhash_detector(spark, sf_dir):
    """Detection → reduction e2e: the MinHash-LSH pair detector feeds
    dedup_keep_canonical; the surviving corpus keeps exactly one
    canonical (minimum doc_id) per duplicate cluster and all isolated
    docs — cross-checked against a driver-side union-find on the same
    pair list."""
    from scio_db_spark.operators.clusters import dedup_keep_canonical
    from scio_db_spark.plans.registry import all_queries

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = all_queries()["docs_minhash_lsh_pairs"].spark(spark, sf_dir)

    kept = {
        r.doc_id
        for r in dedup_keep_canonical(docs, pairs).select("doc_id").collect()
    }

    # driver-side union-find reference
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    plist = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    for a, b in plist:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clustered = set(parent)
    canon = {x for x in clustered if find(x) == x}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    expect = (all_ids - clustered) | canon
    assert kept == expect
    assert plist, "detector found no pairs — test is vacuous"


def test_star_cc_bounded_rounds_on_chain(spark):
    """Worst-case diameter: a 300-node chain. The star algorithm must
    converge in O(log n) rounds where propagation needs O(n); both
    must produce the identical label map (min id per component)."""
    import pytest

    from scio_db_spark.operators.clusters import (
        cc_star_rounds,
        connected_components,
        connected_components_propagation,
    )

    n = 300
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels = {
        r.v: r.label for r in connected_components(edges).collect()
    }
    assert labels == {i: 0 for i in range(n)}

    rounds = cc_star_rounds(edges)
    assert rounds <= 12, f"star took {rounds} rounds on a {n}-chain"

    # the propagation baseline cannot converge within the default cap
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_propagation(edges, max_iterations=20)


def test_star_cc_matches_propagation_on_random_graph(spark):
    import random

    from scio_db_spark.operators.clusters import (
        connected_components,
        connected_components_propagation,
    )

    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    star = {
        r.v: r.label for r in connected_components(df).collect()
    }
    prop = {
        r.v: r.label
        for r in connected_components_propagation(
            df, max_iterations=50
        ).collect()
    }
    # propagation labels every vertex incl. self-loop-only ones; the
    # star variant drops self-loops up front — compare the overlap and
    # make sure star covers every vertex with a real edge
    assert set(star) == {v for v, l in prop.items()
                         if any(a != b and v in (a, b) for a, b in edges)}
    assert all(prop[v] == l for v, l in star.items())
