"""Kneser-Ney bigram LM census: independent plain-Python recompute
(exact integers, no tolerance)."""

from __future__ import annotations

def test_kn_bigram_matches_python_recompute(spark, sf_dir):
    """Independent third derivation: rebuild the KN table in plain
    Python from raw bigram counts and compare the registered top-20
    probabilities exactly (integers — no tolerance)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from scio_db_spark.functions import text as X
    from scio_db_spark.plans.catalog import table
    from scio_db_spark.plans.registry import all_queries

    docs = (
        table(spark, sf_dir, "documents")
        .select(X.tokens(F.col("text")).alias("t"))
        .collect()
    )
    cnt = Counter()
    for r in docs:
        t = r.t
        for i in range(len(t) - 1):
            cnt[(t[i], t[i + 1])] += 1
    cp = Counter()
    n1p = Counter()
    nc = Counter()
    for (w1, w2), c in cnt.items():
        cp[w1] += c
        n1p[w1] += 1
        nc[w2] += 1
    T = len(cnt)
    expected = {}
    for (w1, w2), c in cnt.items():
        expected[f"{w1} {w2}"] = (
            1_000_000 * ((4 * c - 3) * T + 3 * n1p[w1] * nc[w2])
        ) // (4 * cp[w1] * T)
    rows = (
        all_queries()["docs_kn_bigram_topk"].spark(spark, sf_dir).collect()
    )
    assert len(rows) == 20
    for r in rows:
        assert r.p_kn_micro == expected[r.bigram], r.bigram
        assert r.c_xy == cnt[tuple(r.bigram.split(" "))]
