"""Corpus-statistics operators: unigram LM scoring, collocations, OOV.

Extends the training-data text family (plans/textops.py) with the
language-model-flavored curation operators a 100 TB pretraining
pipeline runs between dedup and packing:

- ``docs_unigram_surprisal``: CCNet/Gopher-style unigram-LM quality
  gate. True per-token surprisal is ``log2(N/cnt)`` — a transcendental
  whose last-ulp behavior differs across libm implementations, so the
  score here is the *integer-quantized* surprisal ``bitlen(N) -
  bitlen(cnt)`` (= surprisal rounded into its containing power-of-two
  band). Monotone in 1/cnt, exact integer arithmetic on both engines,
  and exactly as rankable for filtering thresholds.
- ``docs_bigram_colloc_topk``: top collocations with their PMI
  components (pair count + both unigram counts) as exact integers —
  the caller applies the log off-engine; the engine's job is the
  counting, which is where the data volume is.
- ``docs_vocab_coverage``: out-of-vocabulary rate per document against
  the corpus' own top-k vocabulary — the standard "is this document in
  the language the corpus thinks it's in" curation signal.

All three follow the textops float rule: no transcendentals, no float
sums — only integer counts, integer cross-multiplies, and integer
division, so the DuckDB oracle matches bit-for-bit.

Scale notes: each operator is explode → one hash aggregation on the
token/bigram key + one equi-join of the exploded stream against a
vocabulary-sized count table. The count side is pre-aggregated
(bounded by vocabulary, not corpus size), so the join broadcasts when
the vocabulary fits and AQE's skew handling covers the Zipf head
("the" is a hot key on the exploded side, but probe-side skew in a
broadcast join costs nothing — no shuffle of the exploded stream is
ever keyed by word).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from scio_db_spark.functions import text as X
from scio_db_spark.plans.catalog import table
from scio_db_spark.plans.registry import register

_TOKS_SQL = X.tokens_sql("text")

# Engine-parallel word-bigram strings (textops._SHINGLES_SQL with n=2).
_BIGRAMS_SQL = f"""
    CASE WHEN len({_TOKS_SQL}) >= 2
         THEN list_transform(
                generate_series(1, len({_TOKS_SQL}) - 1),
                i -> array_to_string(({_TOKS_SQL})[i:i+1], ' '))
         ELSE [] END
"""


def _docs(spark: SparkSession, sf: str) -> DataFrame:
    # spread_for_compute: tokenization-heavy consumers (see
    # textops._docs / catalog.table for the gate rationale).
    return table(spark, sf, "documents", spread_for_compute=True)


def _exploded(spark: SparkSession, sf: str) -> DataFrame:
    return _docs(spark, sf).select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("word")
    )


# Shared exact-bitlen idiom (see functions/intmath.py for the
# cross-engine rationale); local aliases keep this module's oracle
# f-strings unchanged.
from scio_db_spark.functions.intmath import (  # noqa: E402
    BITLEN_SQL as _BITLEN_SQL,
    bitlen as _bitlen,
)


# --------------------------------------------------------------------------
@register(
    "docs_unigram_surprisal",
    oracle=f"""
    WITH e AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
    ),
    c AS (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY word
    ),
    c2 AS (
        SELECT word, cnt, CAST(sum(cnt) OVER () AS BIGINT) AS n_total
        FROM c
    ),
    per_doc AS (
        SELECT e.doc_id,
            count(*) AS n_tokens,
            CAST(sum({_BITLEN_SQL % "c2.n_total"}
                     - {_BITLEN_SQL % "c2.cnt"}) AS BIGINT)
                AS surprisal_bits
        FROM e JOIN c2 ON c2.word = e.word
        GROUP BY e.doc_id
    )
    SELECT doc_id, n_tokens, surprisal_bits,
        (surprisal_bits * 1000) // n_tokens AS mean_millibits
    FROM per_doc
    """,
    doc="Unigram-LM quality gate (CCNet/Gopher perplexity filtering, "
    "integer-quantized): per-document sum of bitlen(N)-bitlen(cnt) "
    "token surprisal against the corpus' own unigram counts. Two "
    "aggregations (vocab counts, per-doc roll-up) + one equi-join of "
    "the token stream against the vocabulary-bounded count table; the "
    "global total is a window sum over that same vocab-sized frame.",
)
def unigram_surprisal(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    e = _exploded(spark, sf)
    c = e.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    # Corpus total as an unpartitioned window over the VOCAB-sized
    # count frame — the scalar-subquery cross join would compute the
    # explode → aggregate subtree a second time (0 ReusedExchange);
    # the SinglePartition crossing carries only |vocab| rows.
    c2 = c.withColumn(
        "n_total",
        F.sum("cnt").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    scored = e.join(c2, "word")
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(_bitlen(F.col("n_total")) - _bitlen(F.col("cnt"))).alias(
            "surprisal_bits"
        ),
    )
    return per_doc.withColumn(
        "mean_millibits", F.expr("surprisal_bits * 1000 DIV n_tokens")
    )


# --------------------------------------------------------------------------
_COLLOC_K = 20


@register(
    "docs_bigram_colloc_topk",
    oracle=f"""
    WITH e AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
    ),
    uni AS (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY word
    ),
    bg AS (
        SELECT unnest({_BIGRAMS_SQL}) AS bigram FROM documents
    ),
    top AS (
        SELECT bigram, c_xy FROM (
            SELECT bigram, CAST(count(*) AS BIGINT) AS c_xy,
                row_number() OVER (ORDER BY count(*) DESC, bigram) AS rn
            FROM bg GROUP BY bigram
        ) WHERE rn <= {_COLLOC_K}
    )
    SELECT t.bigram, t.c_xy, u1.cnt AS c_x, u2.cnt AS c_y
    FROM top t
    JOIN uni u1 ON u1.word = split_part(t.bigram, ' ', 1)
    JOIN uni u2 ON u2.word = split_part(t.bigram, ' ', 2)
    """,
    doc="Top-k collocations with PMI components: bigram counts ranked "
    "(count desc, bigram asc — deterministic), each joined to its two "
    "unigram counts. PMI's log is applied off-engine; on-engine "
    "everything is exact integer counting. The rank-limit window is "
    "rewritten by Catalyst into a distributed top-k "
    "(window-group-limit), so no full sort of the bigram table; the "
    "two unigram joins probe a 20-row broadcast side.",
)
def bigram_colloc_topk(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    e = _exploded(spark, sf)
    uni = e.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    # Tokens materialize in their own projection BEFORE the bigram
    # transform references them: a non-trivial expression inside a
    # transform lambda re-evaluates once per array ELEMENT (the
    # quadratic-tokenization trap textops.py documents).
    toks_col = F.col("__toks")
    bigrams = F.when(
        F.size(toks_col) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks_col) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks_col, i + 1),
                F.element_at(toks_col, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = (
        _docs(spark, sf)
        .select(X.tokens(F.col("text")).alias("__toks"))
        .select(F.explode(bigrams).alias("bigram"))
    )
    counted = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c_xy"))
    w = Window.orderBy(F.desc("c_xy"), F.asc("bigram"))
    top = (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _COLLOC_K)
        .select(
            "bigram",
            "c_xy",
            F.split(F.col("bigram"), " ").getItem(0).alias("w1"),
            F.split(F.col("bigram"), " ").getItem(1).alias("w2"),
        )
    )
    u1 = uni.select(
        F.col("word").alias("u1_word"), F.col("cnt").alias("c_x")
    )
    u2 = uni.select(
        F.col("word").alias("u2_word"), F.col("cnt").alias("c_y")
    )
    return (
        top.join(u1, top.w1 == u1.u1_word)
        .join(u2, top.w2 == u2.u2_word)
        .select("bigram", "c_xy", "c_x", "c_y")
    )


# --------------------------------------------------------------------------
_VOCAB_K = 15  # top-k corpus vocabulary (test corpus has ~30 distinct
#                words, so k=15 makes the OOV signal non-degenerate)


@register(
    "docs_vocab_coverage",
    oracle=f"""
    WITH e AS (
        SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
    ),
    c AS (
        SELECT word, count(*) AS cnt FROM e GROUP BY word
    ),
    v AS (
        SELECT word FROM (
            SELECT word, row_number() OVER (ORDER BY cnt DESC, word) AS rn
            FROM c
        ) WHERE rn <= {_VOCAB_K}
    ),
    per_doc AS (
        SELECT e.doc_id,
            count(*) AS n_tokens,
            CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_oov
        FROM e LEFT JOIN v ON v.word = e.word
        GROUP BY e.doc_id
    )
    SELECT doc_id, n_tokens, n_oov,
        (n_oov * 1000) // n_tokens AS oov_permille
    FROM per_doc
    """,
    doc="Out-of-vocabulary rate per document against the corpus' own "
    "top-k vocabulary — the curation signal for 'document doesn't "
    "match the corpus register'. The vocabulary is a rank-limited "
    "aggregate (Catalyst window-group-limit → distributed top-k) "
    "small enough to broadcast by construction (k rows), so the "
    "per-token membership test is a map-side left join — the Zipf "
    "head never keys a shuffle.",
)
def vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    e = _exploded(spark, sf)
    c = e.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    v = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _VOCAB_K)
        .select(F.col("word").alias("v_word"))
    )
    per_doc = (
        e.join(F.broadcast(v), e.word == F.col("v_word"), "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("v_word").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )
    return per_doc.withColumn(
        "oov_permille", F.expr("n_oov * 1000 DIV n_tokens")
    )


# --------------------------------------------------------------------------
@register(
    "docs_bigram_cond_surprisal",
    oracle=f"""
    WITH bg AS (
        SELECT doc_id, unnest({_BIGRAMS_SQL}) AS bigram FROM documents
    ),
    b AS (
        SELECT bigram, CAST(count(*) AS BIGINT) AS c_xy
        FROM bg GROUP BY bigram
    ),
    b2 AS (
        SELECT bigram, c_xy, split_part(bigram, ' ', 1) AS w1 FROM b
    ),
    p AS (SELECT w1, CAST(sum(c_xy) AS BIGINT) AS c_x FROM b2 GROUP BY w1),
    j AS (SELECT b2.bigram, b2.c_xy, p.c_x FROM b2 JOIN p USING (w1)),
    per_doc AS (
        SELECT bg.doc_id, count(*) AS n_bigrams,
            CAST(sum({_BITLEN_SQL % "j.c_x"}
                     - {_BITLEN_SQL % "j.c_xy"}) AS BIGINT)
                AS cond_surprisal_bits
        FROM bg JOIN j ON j.bigram = bg.bigram
        GROUP BY bg.doc_id
    )
    SELECT doc_id, n_bigrams, cond_surprisal_bits,
        (cond_surprisal_bits * 1000) // n_bigrams AS mean_millibits
    FROM per_doc
    """,
    doc="Bigram-LM quality gate (the conditional sibling of "
    "docs_unigram_surprisal): per-document sum of integer-quantized "
    "conditional surprisal bitlen(cnt(w1·)) - bitlen(cnt(w1 w2)) "
    "against the corpus' own bigram counts, prefix marginals taken "
    "from the bigram table itself (a consistent LM, exact integer "
    "sums). A low-perplexity document under the corpus LM scores low "
    "mean_millibits — the CCNet-style fluency filter with no "
    "transcendentals, so both engines hash bit-for-bit.",
)
def bigram_cond_surprisal(spark: SparkSession, sf: str) -> DataFrame:
    """Scale shape: one bigram explode pass (tokens materialized in
    their own projection first — the per-element re-evaluation trap),
    ONE data-sized equi-join of the bigram stream against the
    vocabulary-bounded (bigram, c_xy, c_x) table; the prefix marginal
    is an aggregate of the bigram COUNT table, never a second corpus
    pass."""
    toks_col = F.col("__toks")
    bigrams = F.when(
        F.size(toks_col) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks_col) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks_col, i + 1),
                F.element_at(toks_col, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = (
        _docs(spark, sf)
        .select("doc_id", X.tokens(F.col("text")).alias("__toks"))
        .select("doc_id", F.explode(bigrams).alias("bigram"))
    )
    b2 = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
    )
    p = b2.groupBy("w1").agg(F.sum("c_xy").alias("c_x"))
    j = b2.join(p, "w1").select("bigram", "c_xy", "c_x")
    per_doc = bg.join(j, "bigram").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(_bitlen(F.col("c_x")) - _bitlen(F.col("c_xy"))).alias(
            "cond_surprisal_bits"
        ),
    )
    return per_doc.withColumn(
        "mean_millibits",
        F.expr("cond_surprisal_bits * 1000 DIV n_bigrams"),
    )


# --------------------------------------------------------------------------
_ZIPF_TOPN = 1000


@register(
    "docs_zipf_fit",
    oracle=f"""
    WITH c AS (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({_TOKS_SQL}) AS word FROM documents)
        GROUP BY word
    ),
    t AS (
        SELECT cnt, rnk FROM (
            SELECT cnt,
                row_number() OVER (ORDER BY cnt DESC, word) AS rnk
            FROM c
        ) WHERE rnk <= {_ZIPF_TOPN}
    ),
    q AS (
        SELECT CAST(floor(ln(rnk) * 1000000) AS BIGINT) AS x,
            CAST(floor(ln(cnt) * 1000000) AS BIGINT) AS y
        FROM t
    ),
    s AS (
        SELECT CAST(count(*) AS DECIMAL(38,0)) AS n,
            CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
            CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
            CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
            CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
        FROM q
    )
    SELECT CAST(n AS BIGINT) AS n_ranks,
        CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
        / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE) AS slope
    FROM s
    """,
    doc="Zipf power-law fit over the token rank-frequency curve: "
    "least-squares slope of ln(count) vs ln(rank) for the top-1000 "
    "tokens (healthy natural-language corpora sit near −1; synthetic "
    "or templated text drifts off — a cheap corpus-health "
    "diagnostic). Float policy: each ln is quantized to integer "
    "micro-units (floor·1e6) BEFORE any sum, so all sums are exact "
    "integers in DECIMAL(38,0) — immune to double-sum ordering — and "
    "the only float op is one final division of two exact decimals "
    "(string round-trip). Term-level 1-ulp ln drift can flip a floor "
    "only within ~1e-12 of a boundary (the BM25 policy, verified "
    "empirically at both gate SFs). Top-N selection is "
    "TakeOrderedAndProject (per-partition heaps); the row_number and "
    "scalar fit run over the 1000-row frame only.",
)
def zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    c = _exploded(spark, sf).groupBy("word").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    t = c.orderBy(F.desc("cnt"), F.asc("word")).limit(_ZIPF_TOPN)
    ranked = t.select(
        "cnt",
        F.row_number()
        .over(Window.orderBy(F.desc("cnt"), F.asc("word")))
        .alias("rnk"),
    )
    q = ranked.select(
        F.floor(F.log(F.col("rnk").cast("double")) * 1000000)
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cnt").cast("double")) * 1000000)
        .cast("long")
        .alias("y"),
    )
    dec = "decimal(38,0)"
    s = q.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).cast(dec).alias("sx"),
        F.sum(F.col("y").cast(dec)).cast(dec).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast(dec).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast(dec).alias("sxx"),
    )

    def _d2d(col: Column) -> Column:
        return col.cast("string").cast("double")

    return s.select(
        F.col("n").cast("long").alias("n_ranks"),
        (
            _d2d(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / _d2d(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("slope"),
    )


# --------------------------------------------------------------------------
# Kneser-Ney smoothed bigram LM — TRAINING the model the surprisal
# gates only consume. With discount D = 3/4 every quantity is an
# integer count, so the smoothed probability is an exact rational:
#   P_KN(w2|w1) = (c - 3/4)/cp + (3/4 * n1p/cp) * (nc/T)
#               = ((4c - 3)*T + 3*n1p*nc) / (4*cp*T)
# (c >= 1 in the table, so max(c - D, 0) = c - D) and the reported
# micro-probability is one exact floor-division — no transcendentals,
# no doubles, both engines hash bit-for-bit. DECIMAL(38)/HUGEINT
# carries the product headroom (T up to ~1e9 types before overflow).
@register(
    "docs_kn_bigram_topk",
    oracle=f"""
    WITH bg AS (
        SELECT unnest({_BIGRAMS_SQL}) AS bigram FROM documents
    ),
    b AS (
        SELECT bigram, CAST(count(*) AS BIGINT) AS c
        FROM bg GROUP BY bigram
    ),
    b2 AS (
        SELECT bigram, c, split_part(bigram, ' ', 1) AS w1,
            split_part(bigram, ' ', 2) AS w2
        FROM b
    ),
    pre AS (
        SELECT w1, CAST(sum(c) AS BIGINT) AS cp,
            CAST(count(*) AS BIGINT) AS n1p
        FROM b2 GROUP BY w1
    ),
    cont AS (
        SELECT w2, CAST(count(*) AS BIGINT) AS nc FROM b2 GROUP BY w2
    ),
    tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM b2),
    j AS (
        SELECT b2.bigram, b2.c, pre.cp, pre.n1p, cont.nc, tt.t
        FROM b2 JOIN pre USING (w1) JOIN cont USING (w2)
        CROSS JOIN tt
    )
    SELECT bigram, c AS c_xy, cp AS c_prefix, n1p AS n_right_types,
        nc AS n_left_types,
        CAST(
            (1000000::HUGEINT
             * ((4::HUGEINT * c - 3) * t + 3::HUGEINT * n1p * nc))
            // (4::HUGEINT * cp * t) AS BIGINT) AS p_kn_micro
    FROM j ORDER BY c_xy DESC, bigram LIMIT 20
    """,
    doc="Kneser-Ney smoothed bigram probabilities for the corpus' "
    "top-20 bigrams — the LM-TRAINING census next to the surprisal "
    "consumers: absolute discount D=3/4 keeps P_KN an exact rational "
    "over pure counts ((4c-3)T + 3*n1p*nc over 4*cp*T), reported as "
    "one exact floor-division to micro units. Count tables only: one "
    "bigram explode, two vocabulary-bounded aggregates of the bigram "
    "COUNT table (prefix totals + distinct-continuation counts), a "
    "1-row type-total broadcast — the shuffle carries count rows, "
    "never the corpus. The continuation count N1+(.,w2) is what makes "
    "KN the production smoother (and what a naive add-k census "
    "cannot express).",
)
def kn_bigram_topk(spark: SparkSession, sf: str) -> DataFrame:
    toks_col = F.col("__toks")
    bigrams = F.when(
        F.size(toks_col) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks_col) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks_col, i + 1),
                F.element_at(toks_col, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = (
        _docs(spark, sf)
        .select(X.tokens(F.col("text")).alias("__toks"))
        .select(F.explode(bigrams).alias("bigram"))
    )
    b2 = (
        bg.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("w1", F.split(F.col("bigram"), " ").getItem(0))
        .withColumn("w2", F.split(F.col("bigram"), " ").getItem(1))
    )
    pre = b2.groupBy("w1").agg(
        F.sum("c").alias("cp"), F.count(F.lit(1)).alias("n1p")
    )
    cont = b2.groupBy("w2").agg(F.count(F.lit(1)).alias("nc"))
    tt = b2.agg(F.count(F.lit(1)).alias("t"))
    j = (
        b2.join(pre, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(tt))
    )
    p_kn = F.expr(
        "CAST((CAST(1000000 AS DECIMAL(38,0))"
        " * ((CAST(4 AS DECIMAL(38,0)) * c - 3) * t"
        "    + CAST(3 AS DECIMAL(38,0)) * n1p * nc))"
        " DIV (CAST(4 AS DECIMAL(38,0)) * cp * t) AS BIGINT)"
    )
    return (
        j.select(
            "bigram",
            F.col("c").alias("c_xy"),
            F.col("cp").alias("c_prefix"),
            F.col("n1p").alias("n_right_types"),
            F.col("nc").alias("n_left_types"),
            p_kn.alias("p_kn_micro"),
        )
        .orderBy(F.desc("c_xy"), "bigram")
        .limit(20)
    )
