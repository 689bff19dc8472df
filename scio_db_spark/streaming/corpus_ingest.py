"""Streaming corpus ingestion: the streaming face of the text pipeline.

Composes the batch curation operators (plans/textops.py) into the
continuous form a training-data platform actually runs: documents
arrive as a stream, are enriched (content hash, token count, language,
quality), split OK/KO on the quality gate, exact-deduplicated with
BOUNDED state, and land in time-windowed files with KO routed to a
dead-letter path — the mediation-service skeleton (validate → split →
dedup → windowed sink, MediationService.scala:96-131) applied to the
corpus domain.

Scale/state posture:

- Every enrichment is a Column expression (whole-stage codegen, no
  Python).
- Dedup state is bounded by the watermark: a content hash is
  remembered for ``dedup_delay`` past the event-time watermark and
  expired by the engine (``dropDuplicatesWithinWatermark`` — RocksDB
  state store + changelog checkpointing per session defaults). At
  100 TB/day the state is |distinct hashes within the delay window|,
  not corpus history; full-history dedup belongs to the batch layer
  (docs_exact_dedup / dedup_keep_canonical) in the standard
  lambda split.
- Sinks are the K1/K5 windowed file sinks (partition-pruned on read,
  epoch-idempotent batch bodies).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scio_db_spark.functions import text as X
from scio_db_spark.operators.dedup import streaming_distinct_by_key


@dataclass(frozen=True)
class CorpusIngestConfig:
    ts_col: str = "ingest_ts"
    min_quality: float = 0.5  # quality_score gate in [0, 1]
    dedup_delay: str = "10 minutes"  # state-retention bound
    known_langs: tuple[str, ...] = X.LANG_ORDER


def enrich(docs: DataFrame, cfg: CorpusIngestConfig) -> DataFrame:
    """content_hash / n_tokens / lang / quality columns (pure Columns)."""
    toks = X.tokens(F.col("text"))
    return docs.withColumns(
        {
            "content_hash": F.md5(F.col("text")),
            "n_tokens": F.size(toks),
            "lang": X.lang_id(toks),
            "quality": X.quality_score(F.col("text")),
        }
    )


def _ok_predicate(cfg: CorpusIngestConfig) -> Column:
    return (
        F.col("quality").isNotNull()
        & (F.col("quality") >= cfg.min_quality)
        & F.col("lang").isin(*cfg.known_langs)
    )


def build_ok_stream(
    docs: DataFrame, cfg: CorpusIngestConfig = CorpusIngestConfig()
) -> DataFrame:
    """Quality-gated, exactly-once-per-content stream (bounded state).

    Gate metrics (n_total / n_ok / n_ko) ride each micro-batch via
    ``observe()`` under the name ``corpus_gate`` — read them from
    ``query.recentProgress[*]["observedMetrics"]`` (G2 pattern, no
    second scan)."""
    from pyspark.sql import functions as SF

    from scio_db_spark.observability import observe_metrics

    ok = _ok_predicate(cfg)
    e = observe_metrics(
        enrich(docs, cfg),
        "corpus_gate",
        {
            "n_total": SF.count(SF.lit(1)),
            "n_ok": SF.count(SF.when(ok, 1)),
            "n_ko": SF.count(SF.when(~ok, 1)),
        },
    ).filter(ok)
    return streaming_distinct_by_key(
        e,
        "content_hash",
        watermark_col=cfg.ts_col,
        delay=cfg.dedup_delay,
    )


def build_ko_stream(
    docs: DataFrame, cfg: CorpusIngestConfig = CorpusIngestConfig()
) -> DataFrame:
    """Dead-letter leg with a machine-readable reject reason."""
    e = enrich(docs, cfg)
    reason = (
        F.when(F.col("quality").isNull(), "null_text")
        .when(F.col("quality") < cfg.min_quality, "low_quality")
        .otherwise("unknown_lang")
    )
    return e.filter(~_ok_predicate(cfg)).withColumn("reject_reason", reason)


def start_corpus_ingest(
    stream_docs: DataFrame,
    out_path: str,
    checkpoint: str,
    cfg: CorpusIngestConfig = CorpusIngestConfig(),
    window_duration: str = "30 seconds",
    fmt: str = "parquet",
):
    """Wire both legs to the K1/K5 windowed sinks; returns the two
    started queries (ok, ko)."""
    from scio_db_spark.sinks.files import dead_letter_sink, windowed_file_sink

    ok_q = windowed_file_sink(
        build_ok_stream(stream_docs, cfg),
        f"{out_path.rstrip('/')}/ok",
        f"{checkpoint.rstrip('/')}/ok",
        ts_col=cfg.ts_col,
        window_duration=window_duration,
        fmt=fmt,
    )
    ko_q = dead_letter_sink(
        build_ko_stream(stream_docs, cfg),
        out_path,
        f"{checkpoint.rstrip('/')}/ko",
        ts_col=cfg.ts_col,
        window_duration=window_duration,
        fmt=fmt,
    )
    return ok_q, ko_q
