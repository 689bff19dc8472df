"""TF-IDF / BM25 relevance operators vs pure-Python references."""

from __future__ import annotations

import math

import pytest

from scio_db_spark.operators.relevance import (
    bm25_reference,
    bm25_scores,
    tfidf_top_terms,
)

DOCS = [
    ("a", "spark query engine the the the fast engine"),
    ("b", "slow batch table scan scan the"),
    ("c", "query engine query planner the a"),
    ("d", "unrelated words entirely here yes"),
]


@pytest.fixture()
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_tfidf_matches_reference(docs_df, spark):
    rows = tfidf_top_terms(docs_df, k=3).collect()
    n = len(DOCS)
    corpus = {d: t.split() for d, t in DOCS}
    df = {}
    for toks in corpus.values():
        for w in set(toks):
            df[w] = df.get(w, 0) + 1
    for r in rows:
        tf = corpus[r.doc_id].count(r.term)
        assert r.tf == tf
        assert r.df == df[r.term]
        expect = tf * (math.log((n + 1) / (df[r.term] + 1)) + 1)
        assert abs(r.tfidf - expect) < 1e-9
    # per-doc top-k: "engine" must out-rank stopword-ish "the" for a
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.term)
    assert "engine" in by_doc["a"]
    assert len(by_doc["a"]) == 3


def test_bm25_matches_reference_and_ranks_sensibly(docs_df):
    q = ["query", "engine"]
    got = {r.doc_id: r.score for r in bm25_scores(docs_df, q).collect()}
    expect = bm25_reference({d: t.split() for d, t in DOCS}, q)
    assert set(got) == set(expect)  # only matching docs appear
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-9
    # doc with both terms repeatedly beats single-term docs; no score
    # for the unrelated doc
    assert got["c"] > got["b"] if "b" in got else True
    assert "d" not in got
    assert max(got, key=got.get) in {"a", "c"}


def test_bm25_counts_empty_docs_like_the_reference(spark):
    docs = DOCS + [("e", ""), ("f", "   ")]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    q = ["query", "engine"]
    got = {r.doc_id: r.score for r in bm25_scores(df, q).collect()}
    expect = bm25_reference({d: t.split() for d, t in docs}, q)
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-9
