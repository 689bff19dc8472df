"""Text-analysis primitives for the training-data pipeline operators.

Each primitive exists twice, by construction side-by-side: a Spark
Column expression and the equivalent DuckDB SQL fragment used by the
correctness oracle. Everything is deterministic and engine-portable:
tokenization is a regex split, hashes are md5-derived (see
``hashing.py``), scores are rational arithmetic only (no
transcendentals, whose last-ulp behavior can differ across libm
implementations).

Scale notes: all of these compile to Column expressions inside
whole-stage codegen — no Python UDFs — so at 100 TB they run as a
single scan + (where grouping is needed) one hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from scio_db_spark.functions.hashing import MERSENNE_P

# Stopword sets for the n-gram language-ID heuristic. Deliberately tiny:
# the heuristic is argmax of stopword-hit ratios with a fixed
# tie-break order (en > de > fr > es > unknown).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "is", "in"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
    "es": ("el", "los", "las", "y", "es", "un", "una"),
}
LANG_ORDER = ("en", "de", "fr", "es")

PUNCT_CLASS = "[.,!?;:'\"()-]"
# Same class, single-quotes doubled for embedding in a SQL string literal.
PUNCT_CLASS_SQL = PUNCT_CLASS.replace("'", "''")


# ---------------------------------------------------------------- Spark side


def tokens(col: Column) -> Column:
    """Whitespace tokenization, lowercased, empties removed.

    The class is spelled out explicitly because Java's ``\\s``
    includes vertical tab (\\x0B) while DuckDB's RE2 ``\\s`` does not —
    an implicit-class mismatch would silently diverge tokenization
    (and everything built on it) between engine and oracle.
    """
    return F.filter(
        F.split(F.lower(col), "[ \t\n\f\r]+"), lambda x: x != ""
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def stopword_hits(toks: Column, lang: str) -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda x: x.isin(*words)))


def lang_id(toks: Column) -> Column:
    """Argmax of stopword hit counts, fixed tie-break order."""
    hits = {lang: stopword_hits(toks, lang) for lang in LANG_ORDER}
    best = F.greatest(*hits.values())
    expr = F.lit("unknown")
    # Build the CASE from the last language backwards so earlier
    # languages win ties (first match in LANG_ORDER).
    for lang in reversed(LANG_ORDER):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def quality_score(text_col: Column) -> Column:
    """Rational-arithmetic quality score in [0, 1].

    0.5·min(tokens,100)/100 + 0.3·(1 − punct_ratio) + 0.2·stopword_ratio
    """
    toks = tokens(text_col)
    n = F.size(toks).cast("double")
    text_len = F.length(text_col).cast("double")
    punct = (
        text_len - F.length(F.regexp_replace(text_col, PUNCT_CLASS, ""))
    ).cast("double")
    punct_ratio = F.when(text_len > 0, punct / text_len).otherwise(F.lit(0.0))
    all_stop = F.array(
        *[F.lit(w) for lang in LANG_ORDER for w in STOPWORDS[lang]]
    )
    stop_hits = F.size(F.filter(toks, lambda x: F.array_contains(all_stop, x)))
    stop_ratio = F.when(n > 0, stop_hits.cast("double") / n).otherwise(F.lit(0.0))
    score = (
        F.least(n, F.lit(100.0)) / F.lit(100.0) * F.lit(0.5)
        + (F.lit(1.0) - punct_ratio) * F.lit(0.3)
        + stop_ratio * F.lit(0.2)
    )
    # NULL text must score NULL — matched by an explicit CASE in
    # quality_score_sql (DuckDB's least() IGNORES NULL operands, so
    # without the guard a NULL document would score 0.8 there — above
    # most real documents).
    return F.when(text_col.isNotNull(), score)


def fingerprint(token_hashes: Column) -> Column:
    """Order-sensitive rolling document fingerprint.

    Polynomial fold over per-token hashes: acc = (acc·1000003 + h) mod P.
    ``token_hashes`` must already be mod P (array<long>).
    """
    return F.aggregate(
        token_hashes,
        F.lit(1).cast("long"),
        lambda acc, x: (acc * F.lit(1_000_003) + x) % F.lit(MERSENNE_P),
    )


# --------------------------------------------------------------- DuckDB side


def tokens_sql(expr: str) -> str:
    # Explicit class matching tokens() — see its docstring.
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), "
        f"'[ \\t\\n\\f\\r]+'), x -> x <> '')"
    )


def stopword_hits_sql(toks_expr: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks_expr}, x -> x IN ({words})))"


def lang_id_sql(toks_expr: str) -> str:
    hits = {lang: stopword_hits_sql(toks_expr, lang) for lang in LANG_ORDER}
    greatest = "greatest(" + ", ".join(hits.values()) + ")"
    expr = "'unknown'"
    for lang in reversed(LANG_ORDER):
        expr = (
            f"CASE WHEN {hits[lang]} > 0 AND {hits[lang]} = {greatest} "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


def quality_score_sql(text_expr: str) -> str:
    toks = tokens_sql(text_expr)
    all_stop = ", ".join(
        f"'{w}'" for lang in LANG_ORDER for w in STOPWORDS[lang]
    )
    n = f"CAST(len({toks}) AS DOUBLE)"
    text_len = f"CAST(length({text_expr}) AS DOUBLE)"
    punct = (
        f"({text_len} - length(regexp_replace({text_expr}, "
        f"'{PUNCT_CLASS_SQL}', '', 'g')))"
    )
    punct_ratio = f"CASE WHEN {text_len} > 0 THEN {punct} / {text_len} ELSE 0.0 END"
    stop_hits = f"len(list_filter({toks}, x -> x IN ({all_stop})))"
    stop_ratio = f"CASE WHEN {n} > 0 THEN CAST({stop_hits} AS DOUBLE) / {n} ELSE 0.0 END"
    # NULL text scores NULL, exactly like the Spark side. The guard is
    # explicit because DuckDB's least() IGNORES NULL operands
    # (least(NULL, 100.0) = 100.0), so without it a NULL doc would
    # score 0.8 here while Spark returns NULL — quality-gated queries
    # would diverge the moment a corpus contains a NULL document.
    return (
        f"CASE WHEN {text_expr} IS NULL THEN NULL ELSE "
        f"least({n}, 100.0) / 100.0 * 0.5 "
        f"+ (1.0 - ({punct_ratio})) * 0.3 "
        f"+ ({stop_ratio}) * 0.2 END"
    )


def fingerprint_sql(token_hashes_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(1 AS BIGINT), {token_hashes_expr}), "
        f"(acc, x) -> (acc * 1000003 + x) % {MERSENNE_P})"
    )
