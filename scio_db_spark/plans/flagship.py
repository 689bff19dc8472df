"""Flagship end-to-end mediation pipeline (SURVEY.md §3.1, batch form).

Mirrors MediationService.main's dataflow on the synthetic events table:

  scan → validity partition (KO → toxic branch) → idempotency keying →
  historical anti-join (J1) → stateless dedup (D1) → enrichment lookup
  (J2) → windowed aggregation of send statuses (G1/W2)

Every step is a Column-expression transformation; the only shuffles are
the dedup window and the final windowed aggregate. Lookup sides are
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scio_db_spark.operators.dedup import mark_duplicates
from scio_db_spark.operators.joins import anti_join_split, lookup_join
from scio_db_spark.operators.keying import with_idempotent_key
from scio_db_spark.operators.validity import split_ok_ko
from scio_db_spark.operators.windows import tumbling_window_agg
from scio_db_spark.plans.catalog import table

_HIST_CUTOFF = "2024-01-08 00:00:00"


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    customers = table(spark, sf_dir, "customer")

    # F1/F2: validity partition; KO branch would route to the toxic sink.
    valid = (F.col("value") >= 0) & (F.col("event_type") != "error")
    ok, _ko = split_ok_ko(events, valid)

    # P1/P2: idempotency keying.
    keyed = with_idempotent_key(ok, "event_type", F.col("user_id").cast("string"))

    # J1: split fresh traffic vs the historical key set (first week).
    cutoff = F.lit(_HIST_CUTOFF).cast("timestamp")
    hist = keyed.filter(F.col("ts") < cutoff)
    fresh = keyed.filter(F.col("ts") >= cutoff)
    new, _dup = anti_join_split(fresh, hist, on=["idempotent_key"])

    # D1/D4: first-per-key send marking.
    marked = mark_duplicates(new, ["idempotent_key"], ["ts", "event_id"])

    # J2: broadcast enrichment.
    dim = customers.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    enriched = lookup_join(marked, dim, on=["user_id"], default={"segment": "UNKNOWN"})

    # G1/W2: tumbling daily window of send outcomes per segment.
    agg = tumbling_window_agg(
        enriched,
        "ts",
        "1 day",
        group_cols=["segment", "send_status"],
        aggs={
            "n": F.count(F.lit(1)),
            "total_value": F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("string")
            .cast("double"),
        },
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        "segment",
        "send_status",
        "n",
        "total_value",
    )
