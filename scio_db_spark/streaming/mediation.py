"""End-to-end mediation pipeline (SURVEY.md §3.1, MediationService.scala:71-145).

The flagship dataflow of the reference, Spark-first:

```
readStream (BERs) ──────────────────────────────────────────────┐
  STEP 2   key by idempotent_key (P1/P2)                        │
  STEP 2.2 validity partition OK/KO (F1/F2)                     │
  STEP 2.3 KO → tumbling windows → dead-letter files (K5/W2)    │
  STEP 2.b OK ⟕ historical anti-join → new vs dup (J1)
           (broadcast only under HISTORICAL_BROADCAST_MAX_ROWS,
            else shuffle anti-join)
  STEP 3-4 distinctByKey (D1) → stateful TTL dedup (D2/D3/D4)
  STEP 5   SENT rows → async HTTP POST (K4, W8/W9/W11)
  STEP 6   (record, response) analytics projection (P9)
```

Where the reference uses a side-input map of historical keys
(MediationService.scala:110-117), we anti-join the static DataFrame —
broadcast-hinted only while it stays under
``HISTORICAL_BROADCAST_MAX_ROWS``, else a shuffle anti-join — and let
the stream-static join re-resolve per micro-batch: Spark re-plans
stream-static joins every batch, which also gives the J5 "refreshing
side input" semantics for free when the underlying table changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from scio_db_spark.operators.dedup import distinct_by_key
from scio_db_spark.operators.keying import with_idempotent_key
from scio_db_spark.operators.validity import split_ok_ko
from scio_db_spark.schemas import NOT_HTTP_RESPONSE_ID, SENT_OR_DUPLICATED
from scio_db_spark.sinks.http_sink import send_http_batch, to_http_request
from scio_db_spark.streaming.ttl_dedup import SENT, ttl_dedup


def validity_predicate():
    """F1: non-null transaction/notification/customer ids
    (MyEventRecordUtils.scala:15-25) on the flat BER shape — the single
    source of truth lives in operators/validity.py."""
    from scio_db_spark.operators.validity import is_valid_ber

    return is_valid_ber()


#: Above this many historical rows the distinct key set is no longer
#: hinted for broadcast — the stream-static anti-join falls back to a
#: shuffle join instead of shipping the set to every executor. The
#: reference's side-input carries the same constraint ("must fit in
#: worker memory", mediation/README.md:136-137) but only documents it;
#: here it is enforced. ~10M 64-char keys ≈ 1 GiB broadcast — the cap.
HISTORICAL_BROADCAST_MAX_ROWS = 10_000_000


def build_mediation_core(
    stream_df: DataFrame,
    historical_df: DataFrame | None = None,
    ttl_seconds: float = 259200.0,
    order_cols: list[str] | None = None,
    use_timers: bool = True,
    historical_broadcast_max_rows: int = HISTORICAL_BROADCAST_MAX_ROWS,
) -> dict[str, DataFrame]:
    """Build the OK / KO / deduped streaming plans (no sinks attached).

    ``stream_df`` is the flat BER stream (BER_FLAT_SCHEMA columns).
    Returns ``{"ko": ..., "deduped": ...}`` where ``deduped`` carries
    ``send_status`` ∈ {SENT, SENT_OR_DUPLICATED}.

    Memory bound: the historical key set is broadcast to executors only
    when ``historical_df`` holds at most ``historical_broadcast_max_rows``
    rows (one cheap metadata-friendly count at plan-build time — the
    frame is static). Larger retention windows fall back to a shuffle
    left-anti join, which stream-static joins support at any size.
    """
    keyed = with_idempotent_key(
        stream_df, "transaction_id", "customer_id"
    )  # P1/P2: transactionId-customerId, MyEventRecordUtils.scala:55
    # G2 metrics ride the job (no count branch): every query built on
    # either output reports n_total/n_ok/n_ko per micro-batch under
    # observedMetrics["mediation_gate"].
    from scio_db_spark.observability import observe_metrics, validity_metrics

    flagged = keyed.withColumn("__is_valid", validity_predicate())
    observed = observe_metrics(
        flagged, "mediation_gate", validity_metrics("__is_valid")
    )
    ok, ko = split_ok_ko(observed, F.col("__is_valid"))
    ok, ko = ok.drop("__is_valid"), ko.drop("__is_valid")

    if historical_df is not None:
        # J1: already-notified keys are dropped from the send path
        # before state even sees them (dup branch of the reference logs
        # them; the state layer below re-emits any residual dups).
        hist_keys = distinct_by_key(
            historical_df.select("idempotent_key"), "idempotent_key"
        )
        # Size guard: row count upper-bounds the distinct key count.
        # The probe is limit(cap+1).count(), not count(): CollectLimit
        # short-circuits after enough partitions, so deciding "bigger
        # than the cap" on a 100-TB table touches a handful of splits
        # instead of scanning it end-to-end. Decided once at plan-build
        # time — the table is treated as static for the run even though
        # the stream-static join re-reads it per micro-batch; a table
        # that outgrows the cap mid-run keeps its broadcast hint until
        # the pipeline is rebuilt.
        probe = historical_df.select("idempotent_key").limit(
            historical_broadcast_max_rows + 1
        )
        if probe.count() <= historical_broadcast_max_rows:
            hist_keys = F.broadcast(hist_keys)
        ok = ok.join(hist_keys, "idempotent_key", "left_anti")

    out_cols = [
        f"{f.name} {f.dataType.simpleString()}"
        for f in ok.schema.fields
    ]
    deduped = ttl_dedup(
        ok,
        ttl_seconds=ttl_seconds,
        output_schema=", ".join(out_cols) + ", send_status string",
        order_cols=order_cols,
        use_timers=use_timers,
    )
    return {"ko": ko, "deduped": deduped}


def send_deduped_batch(
    batch_df: DataFrame,
    url: str,
    **send_kwargs,
) -> DataFrame:
    """STEP 5-6 batch body: POST only SENT rows; duplicates get the
    constant SENT_OR_DUPLICATED response without a network call (D4,
    StateAsyncParDoWithHttpHandler.scala:155-164).

    Returns the unioned (record, response) analytics DataFrame (P9).
    """
    req = to_http_request(batch_df)
    # BER_FLAT input already carries pre-send placeholders for some
    # response fields (the reference mutates them in place); the send's
    # appended response columns supersede them — drop the clashes or
    # send_http_batch's output schema would declare a duplicate column.
    resp_names = {
        "resp_id", "resp_title", "resp_body", "resp_user_id",
        "nhub_success", "send_latency_ms",
    }
    req = req.drop(*[c for c in req.columns if c in resp_names])
    sent = send_http_batch(
        req.filter(F.col("send_status") == SENT).drop("send_status"), url,
        **send_kwargs,
    ).withColumn("send_status", F.lit(SENT))
    dup = req.filter(F.col("send_status") == SENT_OR_DUPLICATED).withColumns(
        {
            "resp_id": F.lit(NOT_HTTP_RESPONSE_ID),
            "resp_title": F.lit(None).cast("string"),
            "resp_body": F.lit(SENT_OR_DUPLICATED),
            "resp_user_id": F.col("user_id"),
            # The reference classifies the SENT_OR_DUPLICATED response
            # as SUCCESS (its body contains neither "error" nor "ko",
            # MyHttpResponse.scala:19-27) — a duplicate is a correctly
            # handled record, not a failed send.
            "nhub_success": F.lit(True),
            "send_latency_ms": F.lit(0).cast("long"),
        }
    )
    return sent.unionByName(dup.select(*sent.columns))


def run_mediation_pipeline(
    stream_df: DataFrame,
    url: str,
    checkpoint_dir: str,
    dead_letter_path: str,
    analytics_path: str | None = None,
    historical_df: DataFrame | None = None,
    ttl_seconds: float = 259200.0,
    window_duration: str = "30 seconds",
    trigger: dict | None = None,
    order_cols: list[str] | None = None,
    use_timers: bool | None = None,
    **send_kwargs,
) -> dict:
    """Start the full pipeline; returns the running queries.

    ``use_timers`` defaults by trigger shape: armed per-key timers keep
    ``Trigger.AvailableNow`` runs scheduling timer-check batches
    forever, so bounded runs default to the inline-expiry TTL form
    (identical observable semantics — see ``ttl_dedup``); continuous
    runs keep background timer GC.
    """
    from scio_db_spark.sinks.files import dead_letter_sink, idempotent_batch_writer

    if use_timers is None:
        use_timers = not (trigger or {}).get("availableNow", False)
    core = build_mediation_core(
        stream_df,
        historical_df=historical_df,
        ttl_seconds=ttl_seconds,
        order_cols=order_cols,
        use_timers=use_timers,
    )

    ko_query = dead_letter_sink(
        core["ko"],
        dead_letter_path,
        f"{checkpoint_dir}/ko",
        window_duration=window_duration,
    )

    # Epoch-partitioned overwrite, NOT a plain append: foreachBatch is
    # at-least-once, and an epoch replay after a post-write failure
    # would double-count every (record, response) row in analytics.
    analytics_writer = (
        idempotent_batch_writer(analytics_path)
        if analytics_path is not None
        else None
    )

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        out = send_deduped_batch(batch_df, url, **send_kwargs)
        if analytics_writer is not None:
            analytics_writer(out, epoch_id)
        else:
            out.foreach(lambda _row: None)

    writer = (
        core["deduped"]
        .writeStream.foreachBatch(_process)
        .outputMode("update")  # ttl_dedup emits in update mode
        .option("checkpointLocation", f"{checkpoint_dir}/send")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    send_query = writer.start()
    return {"ko_query": ko_query, "send_query": send_query}
