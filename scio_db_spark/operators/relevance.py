"""Corpus relevance scoring: TF-IDF top terms and BM25 ranking.

Rounds out the text-analytics family with the two classical relevance
primitives a data-curation team reaches for: per-document salient
terms (TF-IDF — dataset cards, topic drift monitoring) and ad-hoc
corpus search (BM25 — "find the documents about X" without an external
index).

Shapes at scale:

- TF-IDF: one explode + one (doc, word) aggregate carries the data;
  document frequencies are a vocabulary-bounded frame joined back
  (broadcast when it fits — the same posture as corpusops.py); top-k
  per doc is a window that Catalyst rewrites to a grouped top-k.
- BM25: the query-term filter lands FIRST on the exploded stream, so
  everything downstream is bounded by |docs containing a query term|,
  not corpus size. Corpus scalars (N, avgdl) are a lazy ONE-ROW frame
  cross-joined in (broadcast), so the whole score is a single job
  with no plan-build-time action.

These are library operators (floats are ordinary doubles — no DuckDB
oracle constrains them); correctness is pinned against pure-Python
references in tests/test_relevance.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from scio_db_spark.functions import text as X


def _exploded(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col), F.explode(X.tokens(F.col(text_col))).alias("word")
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """(id, term, tf, df, tfidf) — top-k salient terms per document.

    idf = ln((N+1)/(df+1)) + 1 (sklearn's smooth variant: never
    negative, never divides by zero)."""
    e = _exploded(docs, id_col, text_col)
    n_docs = docs.count()
    tf = e.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    # df from the tf frame (one row per (doc, word) ⇒ its per-word row
    # count IS the document frequency) — avoids a second tokenize +
    # explode pass over the corpus.
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "word").withColumn(
        "tfidf",
        F.col("tf")
        * (
            F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1))
            + F.lit(1.0)
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("word")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, F.col("word").alias("term"), "tf", "df", "tfidf")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, score) for documents matching ≥1 query term, BM25-scored.

    idf uses the standard Robertson form with +1 smoothing:
    ln(1 + (N - df + 0.5)/(df + 0.5))."""
    terms = [t.lower() for t in query_terms]
    e = _exploded(docs, id_col, text_col)
    # Lengths come from the docs frame (token_count, no explode), so
    # zero-token documents COUNT toward N and avgdl — matching
    # bm25_reference, which iterates every corpus doc. An explode-side
    # groupBy would silently exclude empty docs and skew idf/avgdl.
    lengths = docs.select(
        F.col(id_col), X.token_count(F.col(text_col)).alias("dl")
    )
    # Corpus scalars (N, avgdl) stay a LAZY one-row frame cross-joined
    # in (broadcast, constant per row): a .first() here would run a
    # corpus scan at plan-BUILD time — a hidden driver-side action
    # every caller pays (and one the plan-hygiene audit, which only
    # builds plans, would execute blindly).
    stats = lengths.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )
    # query-term filter FIRST: everything after is bounded by matches
    hits = e.filter(F.col("word").isin(*terms))
    tf = hits.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    # ONE crossJoin carrying BOTH stats columns: two separate
    # projections (select('n'), select('avgdl')) would defeat
    # ReuseExchange and run the corpus-stats scan twice. idf is a
    # deterministic function of (n, df), so computing it per matching
    # row instead of per word changes no double bit.
    per_term = (
        tf.join(F.broadcast(df_), "word")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (
                F.col("tf")
                + k1
                * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return per_term.groupBy(id_col).agg(
        F.sum("contrib").alias("score")
    )


def bm25_reference(
    corpus: dict[str, list[str]],
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> dict[str, float]:
    """Pure-Python BM25 over tokenized docs — the test oracle."""
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    df: dict[str, int] = {}
    for toks in corpus.values():
        for t in set(toks) & set(query_terms):
            df[t] = df.get(t, 0) + 1
    out: dict[str, float] = {}
    for doc_id, toks in corpus.items():
        score = 0.0
        dl = len(toks)
        for t in query_terms:
            tf = toks.count(t)
            if tf == 0 or t not in df:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += (
                idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            )
        if score > 0:
            out[doc_id] = score
    return out
