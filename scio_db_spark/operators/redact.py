"""PII redaction for text/JSON columns (training-data scrubbing).

A corpus pipeline must scrub personally-identifiable strings before
training: emails, phone-shaped digit groups, IPv4 addresses, long
id-like digit runs. This implements the standard regex-pass form as a
pure Column ``regexp_replace`` chain — JVM-side, whole-stage codegen,
no Python in the plan — plus a census that counts hits per rule
without materializing the redacted corpus twice.

Rules are ORDERED: earlier rules must not create text that later rules
would mangle, and more specific patterns (email, which contains digit
runs) run before generic ones (bare digit runs). Every pattern sticks
to the regex subset Spark (Java) and DuckDB (RE2) agree on —
character classes, bounded repetition, alternation; no lookaround, no
backreferences — so the oracle twin (`rules_sql`) is the same text.

Reference parity: no counterpart in the reference engine — LLM-data
extension (the quality/language gate's privacy sibling in the corpus
ingest path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — ordered, engine-shared regex subset.
DEFAULT_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{2,4}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}",
     "<PHONE>"),
    ("digit_run", r"[0-9]{2,}", "<NUM>"),
)


def redact(col: Column, rules=DEFAULT_RULES) -> Column:
    """Apply every rule in order; NULL text stays NULL."""
    out = col
    for _name, pattern, repl in rules:
        out = F.regexp_replace(out, pattern, repl)
    return out


def rule_hits(col: Column, pattern: str) -> Column:
    """Match count for one rule on the ORIGINAL text (0 for NULL).

    The NULL guard is an explicit when(), not coalesce(size(...)):
    with spark.sql.ansi.enabled=false, size(NULL) returns -1 (not
    NULL), so the coalesce never fires and every NULL row would
    contribute -1 to the census sum while the DuckDB twin counts 0."""
    return (
        F.when(col.isNull(), F.lit(0))
        .otherwise(F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))))
        .cast("long")
    )


def redaction_census(
    df: DataFrame,
    text_col: str,
    by: str | None = None,
    rules=DEFAULT_RULES,
) -> DataFrame:
    """Per-group census: rows, per-rule hit counts (counted on the
    original text — rule interactions don't hide earlier hits), rows
    changed, and exact char-volume delta. One scan, one aggregate."""
    c = F.col(text_col)
    red = redact(c, rules)
    enriched = df.select(
        *([F.col(by)] if by else []),
        c.alias("__t"),
        red.alias("__r"),
        *[rule_hits(c, p).alias(f"hits_{n}") for n, p, _ in rules],
    )
    keys = [by] if by else []
    return enriched.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(f"hits_{n}").alias(f"hits_{n}") for n, _, _ in rules],
        F.sum(
            F.when(
                F.col("__t").isNotNull() & (F.col("__t") != F.col("__r")), 1
            ).otherwise(0)
        ).alias("n_changed"),
        (
            F.sum(F.coalesce(F.length("__t"), F.lit(0)))
            - F.sum(F.coalesce(F.length("__r"), F.lit(0)))
        ).cast("long").alias("chars_delta"),
    )


def rules_sql(text_expr: str, rules=DEFAULT_RULES) -> dict[str, str]:
    """DuckDB twins: {'redacted': expr, 'hits_<rule>': expr, ...}.

    DuckDB regexp_replace is single-match by default — 'g' makes it
    global like Spark's."""
    red = text_expr
    for _name, pattern, repl in rules:
        red = f"regexp_replace({red}, '{pattern}', '{repl}', 'g')"
    out = {"redacted": red}
    for name, pattern, _ in rules:
        out[f"hits_{name}"] = (
            f"CAST(coalesce(len(regexp_extract_all({text_expr}, "
            f"'{pattern}')), 0) AS BIGINT)"
        )
    return out
