"""One-call corpus report: the dataset-card numbers in a single plan.

Composes the verified curation signals (token counts, language ID,
quality score, exact-dup rate) into ONE aggregation job per grouping —
the summary a dataset card or a drift monitor wants, without running
five separate queries over the corpus.

Scale shape: a single scan computes every per-document signal as
Column expressions (no Python), one hash aggregate per grouping level
(global + per-language). The exact-dup rate rides the same job as a
distinct-count of the content hash — no second dedup pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scio_db_spark.functions import text as X


def corpus_report(
    docs: DataFrame,
    text_col: str = "text",
    by: str | None = "lang",
) -> DataFrame:
    """Summary row(s): doc/token/char volumes, quality distribution,
    duplicate rate — grouped by ``by`` (None → one global row).

    ``by="lang"`` uses the engine's own language-ID if the column is
    absent, so the report runs on raw text-only corpora too.
    """
    toks = X.tokens(F.col(text_col))
    enriched = docs.select(
        F.col(text_col),
        *([F.col(by)] if by and by in docs.columns else []),
        X.token_count(F.col(text_col)).alias("__n_tokens"),
        F.length(F.col(text_col)).alias("__n_chars"),
        X.quality_score(F.col(text_col)).alias("__quality"),
        F.md5(F.col(text_col)).alias("__hash"),
    )
    if by and by not in docs.columns:
        enriched = enriched.withColumn(by, X.lang_id(toks))
    keys = [by] if by else []
    agg = enriched.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("__hash").alias("n_unique_docs"),
        F.sum("__n_tokens").alias("n_tokens"),
        F.sum("__n_chars").alias("n_chars"),
        F.min("__n_tokens").alias("min_tokens"),
        F.expr("percentile_approx(__n_tokens, 0.5)").alias("median_tokens"),
        F.max("__n_tokens").alias("max_tokens"),
        F.avg("__quality").alias("mean_quality"),
        F.expr("percentile_approx(__quality, 0.1)").alias("p10_quality"),
    )
    return agg.withColumn(
        "dup_rate",
        (F.col("n_docs") - F.col("n_unique_docs"))
        / F.col("n_docs").cast("double"),
    )
