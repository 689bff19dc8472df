"""Mediation pipeline surface as batch queries over the ``events`` table.

Each query re-expresses one reference operator (SURVEY.md §2) on the
driver's synthetic events stream table (event_id, ts, user_id,
event_type, value, props). The idempotency key here is
``event_type-user_id`` (standing in for the reference's
``transactionId-customerId``, MyEventRecordUtils.scala:55), and
"validity" is ``value >= 0 AND event_type <> 'error'`` (the synthetic
table has no nulls, so the KO branch routes on the error type instead —
same routing semantics as MyEventRecordUtils.scala:15-25).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scio_db_spark.operators.dedup import mark_duplicates, ttl_sessionize
from scio_db_spark.operators.joins import anti_join_split, lookup_join
from scio_db_spark.operators.keying import with_idempotent_key
from scio_db_spark.operators.validity import split_ok_ko
from scio_db_spark.operators.windows import tumbling_window_agg
from scio_db_spark.plans.catalog import table
from scio_db_spark.plans.registry import register

_KEY_SQL = "event_type || '-' || CAST(user_id AS VARCHAR)"
_VALID_SQL = "(value >= 0 AND event_type <> 'error')"
_HIST_CUTOFF = "2024-01-08 00:00:00"  # first week = "historical"


def _events(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "events")


def _valid_pred():
    return (F.col("value") >= 0) & (F.col("event_type") != "error")


# --------------------------------------------------------------------------
@register(
    "events_key_extraction",
    oracle=f"""
    SELECT event_id, {_KEY_SQL} AS idempotent_key, ts, value
    FROM events
    """,
    doc="P1/P2: idempotency-key extraction + KV mapping.",
)
def key_extraction(spark: SparkSession, sf: str) -> DataFrame:
    e = _events(spark, sf)
    keyed = with_idempotent_key(
        e, "event_type", F.col("user_id").cast("string")
    )
    return keyed.select("event_id", "idempotent_key", "ts", "value")


# --------------------------------------------------------------------------
@register(
    "events_validity_ko_routing",
    oracle=f"""
    SELECT event_id, event_type, user_id, value FROM events
    WHERE NOT coalesce({_VALID_SQL}, FALSE)
    """,
    doc="F1/F2/K5: KO branch of the validity partition (toxic routing).",
)
def ko_routing(spark: SparkSession, sf: str) -> DataFrame:
    e = _events(spark, sf)
    _ok, ko = split_ok_ko(e, _valid_pred())
    return ko.select("event_id", "event_type", "user_id", "value")


# --------------------------------------------------------------------------
@register(
    "events_validity_ok_count",
    oracle=f"""
    SELECT event_type, count(*) AS n FROM events
    WHERE {_VALID_SQL}
    GROUP BY event_type
    """,
    doc="F1/F2 + G2: OK branch with per-type counts.",
)
def ok_count(spark: SparkSession, sf: str) -> DataFrame:
    e = _events(spark, sf)
    ok, _ko = split_ok_ko(e, _valid_pred())
    return ok.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
@register(
    "events_dedup_first_per_key",
    oracle=f"""
    SELECT idempotent_key, event_id, ts FROM (
        SELECT {_KEY_SQL} AS idempotent_key, event_id, ts,
            row_number() OVER (PARTITION BY {_KEY_SQL}
                               ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="D1 deterministic: first record per idempotency key.",
)
def dedup_first(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.dedup import first_per_key

    e = with_idempotent_key(
        _events(spark, sf), "event_type", F.col("user_id").cast("string")
    )
    return first_per_key(e, ["idempotent_key"], ["ts", "event_id"]).select(
        "idempotent_key", "event_id", "ts"
    )


# --------------------------------------------------------------------------
@register(
    "events_dedup_mark_duplicates",
    oracle=f"""
    SELECT idempotent_key, event_id,
        CASE WHEN rn = 1 THEN 'SENT' ELSE 'SENT_OR_DUPLICATED' END AS send_status
    FROM (
        SELECT {_KEY_SQL} AS idempotent_key, event_id,
            row_number() OVER (PARTITION BY {_KEY_SQL}
                               ORDER BY ts, event_id) AS rn
        FROM events
    )
    """,
    doc="D4 contract: duplicates emit SENT_OR_DUPLICATED, not silence.",
)
def dedup_mark(spark: SparkSession, sf: str) -> DataFrame:
    e = with_idempotent_key(
        _events(spark, sf), "event_type", F.col("user_id").cast("string")
    )
    marked = mark_duplicates(e, ["idempotent_key"], ["ts", "event_id"])
    return marked.select("idempotent_key", "event_id", "send_status")


# --------------------------------------------------------------------------
@register(
    "events_dedup_ttl_sessions",
    oracle=f"""
    SELECT idempotent_key, event_id, session_id,
        CASE WHEN new_session = 1 THEN 'SENT' ELSE 'SENT_OR_DUPLICATED' END AS send_status
    FROM (
        SELECT idempotent_key, event_id,
            CAST(sum(new_session) OVER (
                PARTITION BY idempotent_key ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id,
            new_session
        FROM (
            SELECT {_KEY_SQL} AS idempotent_key, event_id, ts,
                CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
                        PARTITION BY {_KEY_SQL} ORDER BY ts, event_id)
                     IS NULL THEN 1
                     WHEN epoch(ts) - lag(epoch(ts)) OVER (
                        PARTITION BY {_KEY_SQL} ORDER BY ts, event_id)
                     >= 86400 THEN 1
                     ELSE 0 END AS new_session
            FROM events
        )
    )
    """,
    headline=True,
    doc="D2 batch analogue: TTL-gap sessionization (1-day TTL).",
)
def dedup_ttl(spark: SparkSession, sf: str) -> DataFrame:
    e = with_idempotent_key(
        _events(spark, sf), "event_type", F.col("user_id").cast("string")
    )
    out = ttl_sessionize(
        e, ["idempotent_key"], "ts", ttl_seconds=86400, tie_cols=["event_id"]
    )
    return out.select("idempotent_key", "event_id", "session_id", "send_status")


# --------------------------------------------------------------------------
@register(
    "events_anti_join_historical",
    oracle=f"""
    WITH hist AS (
        SELECT DISTINCT {_KEY_SQL} AS idempotent_key FROM events
        WHERE ts < TIMESTAMP '{_HIST_CUTOFF}'
    ),
    fresh AS (
        SELECT {_KEY_SQL} AS idempotent_key, event_id, ts FROM events
        WHERE ts >= TIMESTAMP '{_HIST_CUTOFF}'
    )
    SELECT f.idempotent_key, f.event_id, f.ts
    FROM fresh f LEFT JOIN hist h ON f.idempotent_key = h.idempotent_key
    WHERE h.idempotent_key IS NULL
    """,
    headline=True,
    doc="J1 'new' branch: stream keys anti-joined vs broadcast historical set.",
)
def anti_hist(spark: SparkSession, sf: str) -> DataFrame:
    e = with_idempotent_key(
        _events(spark, sf), "event_type", F.col("user_id").cast("string")
    )
    cutoff = F.lit(_HIST_CUTOFF).cast("timestamp")
    hist = e.filter(F.col("ts") < cutoff)
    fresh = e.filter(F.col("ts") >= cutoff)
    new, _dup = anti_join_split(fresh, hist, on=["idempotent_key"])
    return new.select("idempotent_key", "event_id", "ts")


# --------------------------------------------------------------------------
@register(
    "events_semi_join_duplicated",
    oracle=f"""
    WITH hist AS (
        SELECT DISTINCT {_KEY_SQL} AS idempotent_key FROM events
        WHERE ts < TIMESTAMP '{_HIST_CUTOFF}'
    ),
    fresh AS (
        SELECT {_KEY_SQL} AS idempotent_key, event_id FROM events
        WHERE ts >= TIMESTAMP '{_HIST_CUTOFF}'
    )
    SELECT f.idempotent_key, f.event_id
    FROM fresh f WHERE EXISTS (
        SELECT 1 FROM hist h WHERE h.idempotent_key = f.idempotent_key)
    """,
    doc="J1 'duplicated' branch: semi join vs historical key set.",
)
def semi_hist(spark: SparkSession, sf: str) -> DataFrame:
    e = with_idempotent_key(
        _events(spark, sf), "event_type", F.col("user_id").cast("string")
    )
    cutoff = F.lit(_HIST_CUTOFF).cast("timestamp")
    hist = e.filter(F.col("ts") < cutoff)
    fresh = e.filter(F.col("ts") >= cutoff)
    _new, dup = anti_join_split(fresh, hist, on=["idempotent_key"])
    return dup.select("idempotent_key", "event_id")


# --------------------------------------------------------------------------
@register(
    "events_enrich_user_lookup",
    oracle="""
    SELECT e.event_id, e.user_id,
        coalesce(c.c_name, '') AS user_name,
        coalesce(c.c_mktsegment, 'UNKNOWN') AS segment
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,
    doc="J2/J3: stream-table enrichment via broadcast lookup with defaults.",
)
def enrich_users(spark: SparkSession, sf: str) -> DataFrame:
    e = _events(spark, sf).select("event_id", "user_id")
    c = (
        table(spark, sf, "customer")
        .select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_name").alias("user_name"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    # customer is FACT-scale (SF × 150k rows) — no forced broadcast;
    # the size threshold / AQE picks broadcast while it fits and falls
    # back to a shuffle join at real SF (relational.py's
    # broadcast_enrich makes the same call for the same table).
    return lookup_join(
        e,
        c,
        on=["user_id"],
        default={"user_name": "", "segment": "UNKNOWN"},
        hint_broadcast=False,
    )


# --------------------------------------------------------------------------
@register(
    "events_windowed_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
        count(*) AS n,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
            AS total_value
    FROM events GROUP BY 1, 2
    """,
    headline=True,
    doc="G1/W2: tumbling 1h window aggregation per event type.",
)
def windowed_counts(spark: SparkSession, sf: str) -> DataFrame:
    e = _events(spark, sf)
    agg = tumbling_window_agg(
        e,
        "ts",
        "1 hour",
        group_cols=["event_type"],
        aggs={
            "n": F.count(F.lit(1)),
            "total_value": F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("string")
            .cast("double"),
        },
    )
    return agg.select(
        F.col("window.start").alias("window_start"), "event_type", "n", "total_value"
    )


# --------------------------------------------------------------------------
@register(
    "events_json_extract",
    # Malformed-input parity: Spark's get_json_object returns NULL on
    # bad JSON while DuckDB's ->> RAISES, and for a non-integral k
    # Spark's ANSI int cast throws while DuckDB's CAST rounds ('1.5'
    # → 2). Both sides therefore gate: JSON validity explicitly on the
    # DuckDB side, and the cast through an integer-regex guard so a
    # non-integral value is NULL on BOTH engines.
    oracle="""
    SELECT event_id,
        CASE WHEN json_valid(props)
              AND regexp_full_match(
                    coalesce(props->>'$.k', ''), '-?[0-9]+')
             THEN CAST(props->>'$.k' AS INT) END AS k_value
    FROM events
    """,
    doc="P11 inverse: JSON payload field extraction (to_json/from_json "
    "surface), malformed-input-safe on both engines.",
)
def json_extract(spark: SparkSession, sf: str) -> DataFrame:
    e = _events(spark, sf)
    raw = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        F.when(raw.rlike("^-?[0-9]+$"), raw.cast("int")).alias("k_value"),
    )


# --------------------------------------------------------------------------
@register(
    "events_csv_parse_toxic",
    oracle="""
    SELECT event_id,
        CASE WHEN strpos(line, ',') = 0
             THEN 'ToxicRecord-' || CAST(event_id AS VARCHAR)
             ELSE split_part(line, ',', 1) END AS key,
        CASE WHEN strpos(line, ',') = 0 THEN ''
             ELSE split_part(line, ',', 2) END AS value
    FROM (
        SELECT event_id,
            CASE WHEN event_type = 'error' THEN 'garbled payload'
                 ELSE event_type || ',' || CAST(user_id AS VARCHAR) END AS line
        FROM events
    )
    """,
    doc="P13: CSV-ish parse with toxic-key fallback for malformed lines.",
)
def csv_parse(spark: SparkSession, sf: str) -> DataFrame:
    e = _events(spark, sf)
    line = F.when(F.col("event_type") == "error", F.lit("garbled payload")).otherwise(
        F.concat_ws(",", "event_type", F.col("user_id").cast("string"))
    )
    d = e.select("event_id", line.alias("line"))
    has_comma = F.instr("line", ",") > 0
    return d.select(
        "event_id",
        F.when(
            ~has_comma,
            F.concat(F.lit("ToxicRecord-"), F.col("event_id").cast("string")),
        )
        .otherwise(F.split("line", ",").getItem(0))
        .alias("key"),
        F.when(~has_comma, F.lit(""))
        .otherwise(F.split("line", ",").getItem(1))
        .alias("value"),
    )


# --------------------------------------------------------------------------
@register(
    "events_initial_load_tag",
    oracle="""
    SELECT 'INITIAL_LOAD_' || CAST(event_id AS VARCHAR) AS tagged_event_id,
        event_type, user_id
    FROM events WHERE ts < TIMESTAMP '2024-01-08 00:00:00'
    """,
    doc="P3: initial-load tagging (INITIAL_LOAD_ prefix on historical records).",
)
def initial_load_tag(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.schemas import INITIAL_LOAD_PREFIX

    e = _events(spark, sf).filter(
        F.col("ts") < F.lit(_HIST_CUTOFF).cast("timestamp")
    )
    return e.select(
        F.concat(F.lit(INITIAL_LOAD_PREFIX), F.col("event_id").cast("string")).alias(
            "tagged_event_id"
        ),
        "event_type",
        "user_id",
    )


# --------------------------------------------------------------------------
@register(
    "events_retry_increment",
    oracle="""
    SELECT event_id,
        CASE WHEN retries IS NULL THEN 0 ELSE retries + 1 END AS retries
    FROM (
        SELECT event_id,
            CASE WHEN event_id % 5 = 0 THEN NULL
                 ELSE CAST(event_id % 3 AS INT) END AS retries
        FROM events
    )
    """,
    doc="P6: retry counter increment with null → 0 (coalesce).",
)
def retry_increment(spark: SparkSession, sf: str) -> DataFrame:
    e = _events(spark, sf)
    retries = F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("int")).otherwise(
        (F.col("event_id") % 3).cast("int")
    )
    d = e.select("event_id", retries.alias("retries"))
    return d.select(
        "event_id",
        F.coalesce(F.col("retries") + 1, F.lit(0)).alias("retries"),
    )


# --------------------------------------------------------------------------
@register(
    "events_response_classification",
    oracle="""
    SELECT event_id, body,
        NOT (contains(lower(body), 'error') OR contains(lower(body), 'ko'))
            AS nhub_success
    FROM (
        SELECT event_id,
            CASE WHEN event_type = 'error' THEN 'ERROR: failed notification'
                 WHEN value < 10 THEN 'status KO'
                 ELSE 'created id=' || CAST(event_id AS VARCHAR) END AS body
        FROM events
    )
    """,
    doc="P8: HTTP-response success classification (body lacks error/ko).",
)
def response_classification(spark: SparkSession, sf: str) -> DataFrame:
    e = _events(spark, sf)
    body = (
        F.when(F.col("event_type") == "error", F.lit("ERROR: failed notification"))
        .when(F.col("value") < 10, F.lit("status KO"))
        .otherwise(F.concat(F.lit("created id="), F.col("event_id").cast("string")))
    )
    d = e.select("event_id", body.alias("body"))
    success = ~(
        F.lower(F.col("body")).contains("error")
        | F.lower(F.col("body")).contains("ko")
    )
    return d.select("event_id", "body", success.alias("nhub_success"))


# --------------------------------------------------------------------------
@register(
    "events_session_windows",
    oracle="""
    SELECT event_type, min(ts) AS session_start,
        max(ts) + INTERVAL 1 HOUR AS session_end,
        count(*) AS n
    FROM (
        SELECT event_type, ts,
            CAST(sum(new_session) OVER (
                PARTITION BY event_type ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM (
            SELECT event_type, ts, event_id,
                -- STRICTLY greater: Spark's session_window MERGES two
                -- events exactly one gap apart (verified: ts and
                -- ts+3600s form ONE session), so the islands boundary
                -- is gap > 3600, not >=. An exact-3600 pair in the
                -- data would otherwise split here and hash-mismatch.
                CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (
                        PARTITION BY event_type ORDER BY ts, event_id)
                     > 3600 OR lag(epoch(ts)) OVER (
                        PARTITION BY event_type ORDER BY ts, event_id)
                     IS NULL THEN 1 ELSE 0 END AS new_session
            FROM events
        )
    )
    GROUP BY event_type, session_id
    """,
    doc="Native session windows (1h gap) per event type — Spark's "
    "session_window vs the oracle's gaps-and-islands formulation; "
    "in streaming the same call merges sessions across micro-batches "
    "with watermark-bounded state.",
)
def session_windows(spark: SparkSession, sf: str) -> DataFrame:
    e = _events(spark, sf)
    agg = e.groupBy(
        F.session_window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return agg.select(
        "event_type",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n",
    )


# --------------------------------------------------------------------------
@register(
    "events_asof_latest_order",
    headline=True,
    oracle="""
    WITH r AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                   ORDER BY o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, e.ts,
        r.o_orderkey AS last_order_key,
        r.o_totalprice AS last_order_total
    FROM events e ASOF LEFT JOIN r
      ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
    doc="As-of join (custom operator): latest order at-or-before each "
    "event, via union + last-value window (one shuffle, |L|+|R| rows "
    "— no inequality-join blow-up); oracle = DuckDB native ASOF JOIN.",
)
def asof_latest_order(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.asof import asof_join

    e = _events(spark, sf).select("event_id", "user_id", "ts")
    o = table(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        F.col("o_orderkey").alias("last_order_key"),
        F.col("o_totalprice").alias("last_order_total"),
    )
    return asof_join(
        e,
        o,
        key="user_id",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["last_order_key", "last_order_total"],
        tie_col="last_order_key",
    )


# --------------------------------------------------------------------------
@register(
    "events_orders_range_count",
    oracle="""
    SELECT e.event_id,
        count(o.o_orderkey) AS n_orders_30d,
        coalesce(CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                 AS VARCHAR) AS DOUBLE), 0.0) AS total_30d
    FROM events e LEFT JOIN orders o
      ON o.o_custkey = e.user_id
     AND o.o_orderdate > e.ts - INTERVAL 30 DAY
     AND o.o_orderdate <= e.ts
    WHERE e.user_id <= 200
    GROUP BY e.event_id
    """,
    doc="Range join (custom operator): orders within a 30-day window "
    "before each event. The equi-key (user) carries the shuffle — the "
    "range is a residual filter per key group, so candidates are "
    "bounded by per-user order counts, never |L|x|R|. For key-free "
    "range joins, bucket both sides by coarse time bin and join on "
    "(bin, bin-1) — same residual-filter shape.",
)
def range_count(spark: SparkSession, sf: str) -> DataFrame:
    e = _events(spark, sf).filter(F.col("user_id") <= 200).select(
        "event_id", "user_id", "ts"
    )
    o = table(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate",
        "o_orderkey", "o_totalprice",
    )
    joined = e.join(
        o,
        (e["user_id"] == o["user_id"])
        & (F.col("o_orderdate") > F.col("ts") - F.expr("INTERVAL 30 DAYS"))
        & (F.col("o_orderdate") <= F.col("ts")),
        "left",
    )
    return joined.groupBy("event_id").agg(
        F.count("o_orderkey").alias("n_orders_30d"),
        F.coalesce(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("string")
            .cast("double"),
            F.lit(0.0),
        ).alias("total_30d"),
    )


# --------------------------------------------------------------------------
_GRID_START, _GRID_END = "2024-01-01 00:00:00", "2024-01-30 23:00:00"
_GRID_MAX_USER = 20


@register(
    "events_resample_hourly_ffill",
    oracle=f"""
    WITH users AS (
        SELECT DISTINCT user_id FROM events WHERE user_id <= {_GRID_MAX_USER}
    ),
    grid AS (
        SELECT user_id,
            unnest(generate_series(TIMESTAMP '{_GRID_START}',
                                   TIMESTAMP '{_GRID_END}',
                                   INTERVAL 1 HOUR)) AS grid_ts
        FROM users
    ),
    r AS (
        SELECT user_id, ts, last_value, last_event_id FROM (
            SELECT user_id, ts, value AS last_value,
                event_id AS last_event_id,
                row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) AS rn
            FROM events WHERE user_id <= {_GRID_MAX_USER}
        ) WHERE rn = 1
    )
    SELECT g.user_id, g.grid_ts, r.last_value, r.last_event_id
    FROM grid g ASOF LEFT JOIN r
      ON g.user_id = r.user_id AND g.grid_ts >= r.ts
    """,
    doc="Time-series resample: hourly grid per user, forward-filled "
    "with the latest event at-or-before each grid point (gap-fill). "
    "Built ON the as-of join operator — grid rows are the left side, "
    "so the whole resample is one keyed shuffle of |grid|+|events| "
    "rows; NULL before a user's first event. Oracle = DuckDB native "
    "ASOF JOIN over the same generated grid.",
)
def resample_hourly_ffill(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.asof import asof_join

    ev = _events(spark, sf).filter(F.col("user_id") <= _GRID_MAX_USER)
    users = ev.select("user_id").distinct()
    grid = users.select(
        "user_id",
        F.explode(
            F.sequence(
                F.lit(_GRID_START).cast("timestamp"),
                F.lit(_GRID_END).cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("grid_ts"),
    )
    right = ev.select(
        "user_id",
        "ts",
        F.col("value").alias("last_value"),
        F.col("event_id").alias("last_event_id"),
    )
    return asof_join(
        grid,
        right,
        key="user_id",
        left_time="grid_ts",
        right_time="ts",
        payload_cols=["last_value", "last_event_id"],
        tie_col="last_event_id",
    )


# --------------------------------------------------------------------------
_HOUR_US = 3_600_000_000


@register(
    "events_moving_hour_stats",
    oracle=f"""
    SELECT event_id,
        count(*) OVER w AS n_1h,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS VARCHAR)
             AS DOUBLE) AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)
    """,
    doc="Moving one-hour window per user (RANGE frame over event-time "
    "micros): trailing count and exact-decimal sum for every event. "
    "The frame surface (rows/range windows) the rank queries don't "
    "touch; one hash shuffle on user_id, per-partition sort, frames "
    "evaluated in a single pass.",
)
def moving_hour_stats(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-_HOUR_US, 0)
    )
    return ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).alias("__s"),
    ).select(
        "event_id", "n_1h",
        F.col("__s").cast("string").cast("double").alias("sum_1h"),
    )


# --------------------------------------------------------------------------
@register(
    "events_type_transition_matrix",
    oracle="""
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM (
        SELECT event_type,
            lag(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS prev_type
        FROM events
    )
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
    doc="Event-type transition matrix per user stream (lag window + "
    "pair counts) — the Markov-ish session analytics shape: one "
    "shuffle on user_id for the lag, then a tiny keyed agg.",
)
def type_transition_matrix(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
@register(
    "events_daily_retention",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT CAST(a.day AS VARCHAR) AS day,
        count(*) AS n_active,
        count(b.user_id) AS n_retained
    FROM act a
    LEFT JOIN act b
      ON b.user_id = a.user_id AND b.day = a.day + 1
    GROUP BY a.day
    """,
    doc="Next-day retention: distinct (user, day) activity set "
    "self-joined one day forward. The activity set is "
    "distinct-reduced before the join (bounded by users x days, not "
    "event volume); the self-join is an equi-join on (user, day) — "
    "both sides share the same shuffle partitioning, so AQE reuses "
    "the exchange at scale.",
)
def daily_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    act = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    nxt = act.select(
        F.col("user_id").alias("user_id"),
        F.date_sub(F.col("day"), 1).alias("day"),
        F.lit(1).alias("__ret"),
    )
    return (
        act.join(nxt, ["user_id", "day"], "left")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.count("__ret").alias("n_retained"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "events_type_hour_profile",
    oracle="""
    SELECT event_type, hour(ts) AS hr,
        count(*) AS n, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type, hr
    """,
    doc="Traffic profile: event counts and distinct users per "
    "(type, hour-of-day). One aggregate; the distinct count shuffles "
    "on (type, hr, user) — swap for approx_count_distinct at 100 TB "
    "if a 2% error is acceptable.",
)
def type_hour_profile(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    return ev.groupBy(
        "event_type", F.hour("ts").alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
@register(
    "events_rollup_hourly",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS bucket_start,
        CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS VARCHAR)
            AS bucket_end,
        strftime(date_trunc('hour', ts), '%Y-%m-%d') AS bucket_date,
        event_type,
        count(*) AS n,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
            AS total
    FROM events GROUP BY 1, 2, 3, 4
    """,
    doc="Batch form of the continuous rollup (streaming/rollup.py): "
    "the SAME rollup_plan that maintains the streaming continuous "
    "aggregate, run over the bounded table — proving the maintenance "
    "path computes exactly this oracle-checked aggregate. Buckets "
    "rendered as strings for a timezone-free compare.",
)
def rollup_hourly(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.streaming.rollup import rollup_plan

    ev = _events(spark, sf)
    out = rollup_plan(
        ev, "ts", "1 hour",
        aggs={
            "n": F.count(F.lit(1)),
            "total": F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("string").cast("double"),
        },
        group_cols=("event_type",),
    )
    return out.select(
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_start"),
        F.date_format("bucket_end", "yyyy-MM-dd HH:mm:ss")
        .alias("bucket_end"),
        "bucket_date", "event_type", "n", "total",
    )


# --------------------------------------------------------------------------
@register(
    "events_funnel_view_purchase",
    headline=True,
    oracle="""
    WITH v AS (
        SELECT user_id, ts FROM events WHERE event_type = 'view'
    ),
    p AS (
        SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id,
        strftime(min(p.ts), '%Y-%m-%d %H:%M:%S.%f') AS first_conversion,
        count(*) AS n_pairs
    FROM v JOIN p ON p.user_id = v.user_id
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
    GROUP BY v.user_id
    """,
    doc="Funnel step: view -> purchase within one hour, per user. The "
    "equi-join on user_id carries the shuffle; the time window is a "
    "residual range predicate (the events_orders_range_count pattern), "
    "so no inequality-join blow-up — candidate pairs are bounded per "
    "user, not global.",
)
def funnel_view_purchase(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    pairs = v.join(
        p,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return pairs.groupBy("user_id").agg(
        F.date_format(F.min("p_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("first_conversion"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


# --------------------------------------------------------------------------
# MAD outlier threshold 3 * 1.4826 (consistency constant) = 4.4478,
# folded into integer arithmetic as 44478/10000 in both engines below.


@register(
    "events_value_mad_outliers",
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    m AS (
        SELECT event_type,
            CAST(2 * quantile_cont(vc, 0.5) AS BIGINT) AS med2
        FROM e GROUP BY event_type
    ),
    d AS (
        SELECT e.event_type, abs(2 * e.vc - m.med2) AS dev2, m.med2
        FROM e JOIN m USING (event_type)
    ),
    a AS (
        SELECT event_type,
            CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
        FROM d GROUP BY event_type
    )
    SELECT d.event_type, count(*) AS n,
        any_value(d.med2) AS med2_cents, any_value(a.mad4) AS mad4_cents,
        CAST(sum(CASE WHEN 20000 * d.dev2 > 44478 * a.mad4
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN a USING (event_type)
    GROUP BY d.event_type
    """,
    doc="Robust outlier census per event type: median / MAD (median "
    "absolute deviation), outliers = |v − med| > 3·1.4826·MAD — the "
    "robust z-score every monitoring pipeline wants where mean/stddev "
    "are ruined by the very outliers being hunted. EXACT-INTEGER "
    "FORM: values quantize to cents (floor(value·100) — a bitwise- "
    "deterministic map of the identical input double in both "
    "engines), and the two medians are carried DOUBLED (med2 = 2·med "
    "cents, mad4 = 4·MAD cents): interpolation at the 0.5 quantile "
    "over integers is (a+b)/2, so doubling restores an exact BIGINT "
    "and no float interpolation (a 1-ulp cross-engine divergence "
    "class — quantile_cont's a+(b−a)·f vs weighted-sum forms) ever "
    "reaches an output or the outlier comparison, which folds the "
    "3·1.4826 constant into pure int64 20000·dev2 > 44478·mad4. "
    "Exact medians are inherently multi-pass (MAD needs med first); "
    "the per-type broadcast of the tiny med/mad frames keeps every "
    "pass a map-side join + keyed agg. SCALE NOTE: 3 fact scans for "
    "exactness; at 100 TB swap percentile→approx_percentile "
    "(fixed-size mergeable sketch, one pass per level) and accept "
    "the documented bound.",
)
def value_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf).select(
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("vc"),
    )
    med = ev.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(vc, 0.5D) AS BIGINT)").alias("med2")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med2",
        F.abs(2 * F.col("vc") - F.col("med2")).alias("dev2"),
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(dev2, 0.5D) AS BIGINT)").alias("mad4")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("med2").alias("med2_cents"),
            F.first("mad4").alias("mad4_cents"),
            F.sum(
                F.when(
                    20000 * F.col("dev2") > 44478 * F.col("mad4"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
    )


def _conversion_latency_us(spark: SparkSession, sf: str) -> DataFrame:
    """One row per viewer: view→purchase latency in µs (NULL when the
    viewer never converted). Shared by the exact census and its
    mergeable-sketch twin."""
    ev = _events(spark, sf)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    return _first_at_or_after(ev, v, "purchase", "v_ts", "p_ts").select(
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("lat_us")
    )



# --------------------------------------------------------------------------
@register(
    "events_conversion_latency",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    j AS (
        SELECT v.user_id, v.v_ts, min(p.ts) AS p_ts
        FROM v LEFT JOIN events p
          ON p.user_id = v.user_id AND p.event_type = 'purchase'
         AND p.ts >= v.v_ts
        GROUP BY v.user_id, v.v_ts
    ),
    l AS (SELECT epoch_us(p_ts) - epoch_us(v_ts) AS lat_us FROM j),
    s AS (
        SELECT count(*) AS n_viewers,
            count(lat_us) AS n_converted,
            list_sort(list(lat_us) FILTER (WHERE lat_us IS NOT NULL))
                AS lats
        FROM l
    )
    SELECT n_viewers, n_converted,
        n_converted * 1000 // n_viewers AS conv_permille,
        CASE WHEN n_converted = 0 THEN NULL ELSE
            lats[(n_converted - 1) // 2 + 1]
            + lats[(n_converted - 1) // 2 + 1 + (n_converted - 1) % 2]
        END AS med_x2_us,
        CASE WHEN n_converted = 0 THEN NULL ELSE
            10 * lats[(n_converted - 1) * 9 // 10 + 1]
            + (lats[least((n_converted - 1) * 9 // 10 + 2, n_converted)]
               - lats[(n_converted - 1) * 9 // 10 + 1])
              * ((n_converted - 1) * 9 % 10)
        END AS p90_x10_us
    FROM s
    """,
    doc="View→purchase conversion latency: each viewer's FIRST view, "
    "their first purchase at/after it, exact median and p90 of the "
    "latency distribution plus a conversion-rate census — the "
    "time-to-convert companion of events_funnel_view_purchase. The "
    "purchase probe is an equi-join on user_id against the "
    "user-level (already reduced) first-view frame with the ts bound "
    "as a residual predicate; the final exact stats run over ONE row "
    "per user, not per event. EXACT-INTEGER OUTPUTS: the engine "
    "quantile interpolation a+(b−a)·f is not an identical expression "
    "tree across engines (1-ulp class), so the type-7 quantiles are "
    "computed from the bracketing order statistics with the fraction "
    "folded in RATIONAL arithmetic — med_x2_us = a+b (2× the median) "
    "and p90_x10_us = 10·a + (b−a)·((n−1)·9 mod 10) (10× the p90) "
    "are pure int64 on microsecond latencies in both engines. SCALE "
    "NOTE: the sorted-array aggregate funnels |converters| reduced "
    "rows to one task (whitelisted); at 100 TB swap to "
    "approx_percentile's mergeable sketch.",
)
def conversion_latency(spark: SparkSession, sf: str) -> DataFrame:
    j = _conversion_latency_us(spark, sf)
    s = j.agg(
        F.count(F.lit(1)).alias("n_viewers"),
        F.count("lat_us").alias("n_converted"),
        # collect_list drops NULLs (non-converters), matching the
        # oracle's FILTER clause.
        F.sort_array(F.collect_list("lat_us")).alias("lats"),
    )
    return s.select(
        "n_viewers",
        "n_converted",
        F.expr("n_converted * 1000 DIV n_viewers").alias("conv_permille"),
        F.expr(
            "CASE WHEN n_converted = 0 THEN NULL ELSE "
            "element_at(lats, CAST((n_converted - 1) DIV 2 + 1 AS INT)) "
            "+ element_at(lats, CAST((n_converted - 1) DIV 2 + 1 "
            "             + (n_converted - 1) % 2 AS INT)) END"
        ).alias("med_x2_us"),
        F.expr(
            "CASE WHEN n_converted = 0 THEN NULL ELSE "
            "10 * element_at(lats, "
            "     CAST((n_converted - 1) * 9 DIV 10 + 1 AS INT)) "
            "+ (element_at(lats, "
            "     CAST(least((n_converted - 1) * 9 DIV 10 + 2, "
            "                n_converted) AS INT)) "
            "   - element_at(lats, "
            "     CAST((n_converted - 1) * 9 DIV 10 + 1 AS INT))) "
            "  * ((n_converted - 1) * 9 % 10) END"
        ).alias("p90_x10_us"),
    )


# --------------------------------------------------------------------------
# Log-grid quantile sketch resolution: values bucket to their top
# (_GRID_BITS+1) significant bits, so the bucket floor under-reports a
# value by < 2^-_GRID_BITS relative (1.6%). Bucket count is bounded by
# 2^_GRID_BITS per octave x 63 octaves for ANY input volume.
_GRID_BITS = 6


def grid_bucket_sql(col: str) -> str:
    """SQL fragment mapping a non-negative integer column to its
    log-grid bucket FLOOR — the one definition shared by the batch
    census and the streaming counter twin
    (streaming/quantile_stream.py), so their histograms are
    bit-comparable. NULL stays NULL."""
    shift = f"greatest(length(bin({col})) - 1 - {_GRID_BITS}, 0)"
    return (
        f"CASE WHEN {col} IS NULL THEN NULL ELSE "
        f"shiftleft(shiftright({col}, {shift}), {shift}) END"
    )


_GRID_SHIFT = f"greatest(length(bin(lat_us)) - 1 - {_GRID_BITS}, 0)"
# ranks match events_conversion_latency's lower order statistics
_P50_RANK = "(n_converted - 1) DIV 2 + 1"
_P90_RANK = "(n_converted - 1) * 9 DIV 10 + 1"


@register(
    "events_latency_quantile_sketch",
    oracle=f"""
    WITH v AS (
        SELECT user_id, min(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    j AS (
        SELECT v.user_id, v.v_ts, min(p.ts) AS p_ts
        FROM v LEFT JOIN events p
          ON p.user_id = v.user_id AND p.event_type = 'purchase'
         AND p.ts >= v.v_ts
        GROUP BY v.user_id, v.v_ts
    ),
    l AS (SELECT epoch_us(p_ts) - epoch_us(v_ts) AS lat_us FROM j),
    b AS (
        SELECT CASE WHEN lat_us IS NULL THEN NULL ELSE
            (lat_us >> greatest(length(bin(lat_us)) - 1 - {_GRID_BITS}, 0))
            << greatest(length(bin(lat_us)) - 1 - {_GRID_BITS}, 0)
            END AS blo,
            CAST(count(*) AS BIGINT) AS cnt
        FROM l GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(cnt) AS BIGINT) AS n_viewers,
            coalesce(CAST(sum(cnt) FILTER (WHERE blo IS NOT NULL)
                          AS BIGINT), 0) AS n_converted
        FROM b
    ),
    c AS (
        SELECT blo, sum(cnt) OVER (ORDER BY blo) AS cum
        FROM b WHERE blo IS NOT NULL
    )
    SELECT n_viewers, n_converted,
        (SELECT min(blo) FROM c
         WHERE cum >= (n_converted - 1) // 2 + 1) AS p50_us_est,
        (SELECT min(blo) FROM c
         WHERE cum >= (n_converted - 1) * 9 // 10 + 1) AS p90_us_est
    FROM tot
    """,
    doc="The 100 TB path of events_conversion_latency: same "
    "view→purchase latency frame, quantiles from a DETERMINISTIC "
    "log-grid histogram sketch — each latency buckets to its top 7 "
    "significant bits (HdrHistogram-style), bucket counts sum "
    "(trivially mergeable, fixed <= 63*64-cell state), and the "
    "quantile is the first bucket floor whose cumulative count "
    "reaches the exact census's rank, under-reporting by < 2^-6 "
    "relative. The exact census funnels the sorted per-converter "
    "array to one task (whitelisted, fine at |converters| scale); "
    "here the shuffle carries BUCKET COUNTS, so the plan holds at "
    "any row count — and unlike approx_percentile's GK summary "
    "(whose merge order is engine-internal; kept as the operator-"
    "level alternative, error-bounded in tests/test_quantile_sketch) "
    "the grid is bit-reproducible in DuckDB, making the estimate "
    "itself oracle-checked. Relative-error bound pinned in "
    "tests/test_quantile_sketch.py.",
)
def latency_quantile_sketch(spark: SparkSession, sf: str) -> DataFrame:
    j = _conversion_latency_us(spark, sf)
    b = j.groupBy(
        F.expr(grid_bucket_sql("lat_us")).alias("blo")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    hist = b.agg(
        F.sum("cnt").alias("n_viewers"),
        F.coalesce(
            F.sum(F.when(F.col("blo").isNotNull(), F.col("cnt"))),
            F.lit(0),
        ).alias("n_converted"),
        # when() drops non-converter rows from the list; struct order
        # sorts by blo (first field) — the cumulative walk's order
        F.sort_array(
            F.collect_list(
                F.when(
                    F.col("blo").isNotNull(), F.struct("blo", "cnt")
                )
            )
        ).alias("__h"),
    )

    def _walk(rank_sql: str) -> str:
        return (
            "aggregate(__h, "
            "struct(CAST(0 AS BIGINT) AS cum, CAST(NULL AS BIGINT) AS v), "
            "(acc, x) -> struct(acc.cum + x.cnt, "
            f"CASE WHEN acc.v IS NULL AND acc.cum + x.cnt >= {rank_sql} "
            "THEN x.blo ELSE acc.v END), "
            "acc -> acc.v)"
        )

    return hist.select(
        "n_viewers",
        "n_converted",
        F.expr(_walk(_P50_RANK)).alias("p50_us_est"),
        F.expr(_walk(_P90_RANK)).alias("p90_us_est"),
    )


# --------------------------------------------------------------------------
# Mergeable-sketch rollup: WHY sketches win at 100 TB. Day-level HLL
# register tables are the pre-aggregated cube cells a production
# pipeline materializes once per partition; any coarser distinct-count
# (per type, per month, whole corpus) is a max-merge of CELLS — no raw
# re-scan, no shuffle of user ids. count(DISTINCT) offers nothing to
# merge: every rollup level re-shuffles the raw keys.
def _hll_rollup_oracle() -> str:
    from scio_db_spark.functions.hashing import str_hash60_sql
    from scio_db_spark.plans.textops import (
        _HLL_M,
        _HLL_RHO_MAX,
        hll_estimate_select_sql,
    )

    uid = str_hash60_sql("CAST(user_id AS VARCHAR)")
    return f"""
    WITH h AS (
        SELECT event_type, CAST(ts AS DATE) AS day, {uid} AS h
        FROM events
    ),
    cells AS (
        SELECT event_type, day, h % {_HLL_M} AS idx, h // {_HLL_M} AS rest
        FROM h
    ),
    dayregs AS (
        SELECT event_type, day, idx,
            max(CASE WHEN rest > 0
                     THEN {_HLL_RHO_MAX} - length(bin(rest))
                     ELSE {_HLL_RHO_MAX} END) AS mj
        FROM cells GROUP BY event_type, day, idx
    ),
    regs AS (
        SELECT event_type, idx, max(mj) AS mj
        FROM dayregs GROUP BY event_type, idx
    ),
    est AS ({hll_estimate_select_sql('regs', 'event_type',
                                     'distinct_users_est')}),
    ex AS (
        SELECT event_type,
            CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
            CAST(count(DISTINCT user_id) AS BIGINT)
                AS distinct_users_exact
        FROM events GROUP BY event_type
    )
    SELECT ex.event_type, ex.n_days, ex.distinct_users_exact,
        est.distinct_users_est
    FROM ex JOIN est ON ex.event_type = est.event_type
    ORDER BY ex.event_type
    """


@register(
    "events_distinct_users_hll_rollup",
    oracle=_hll_rollup_oracle(),
    doc="Mergeable-sketch rollup: distinct users per event_type "
    "computed by MERGING day-level HLL register tables (max over "
    "cells), never re-scanning raw user ids — the pre-aggregated-"
    "cube-cell pattern that makes sketches the 100 TB answer where "
    "count(DISTINCT) re-shuffles raw keys at every rollup level. "
    "Registers use the deterministic md5 hashing of "
    "docs_token_hll_estimate (shared hll_register_entry /"
    "hll_estimate_over), so the DuckDB twin reproduces day cells, "
    "merged registers, AND the estimate bit-for-bit; the exact "
    "distinct count rides along to expose the estimator error "
    "(within the 4096-register rsd, pinned in "
    "tests/test_hll_stream.py's estimator suite and the census "
    "itself).",
)
def distinct_users_hll_rollup(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.plans.textops import (
        hll_estimate_over,
        hll_register_entry,
    )

    e = _events(spark, sf)
    day_regs = (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            hll_register_entry(F.col("user_id").cast("string")).alias(
                "e"
            ),
        )
        .groupBy("event_type", "day", F.col("e.idx").alias("idx"))
        .agg(F.max("e.rho").alias("mj"))
    )
    merged = day_regs.groupBy("event_type", "idx").agg(
        F.max("mj").alias("mj")
    )
    est = hll_estimate_over(merged, "event_type", "distinct_users_est")
    exact = e.groupBy("event_type").agg(
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.countDistinct("user_id").alias("distinct_users_exact"),
    )
    return (
        exact.join(est, "event_type")
        .select(
            "event_type",
            "n_days",
            "distinct_users_exact",
            "distinct_users_est",
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
@register(
    "events_weekly_cohort_matrix",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id,
            CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ),
    coh AS (SELECT user_id, min(wk) AS cwk FROM act GROUP BY user_id)
    SELECT CAST(cwk AS VARCHAR) AS cohort_week,
        date_diff('day', cwk, wk) // 7 AS week_offset,
        count(*) AS n_active
    FROM act JOIN coh USING (user_id)
    GROUP BY cwk, week_offset
    """,
    doc="Weekly cohort retention matrix (the full product-analytics "
    "shape behind events_daily_retention): users bucketed by their "
    "first active ISO week, activity counted per (cohort, weeks-since) "
    "cell. The activity set is distinct-reduced to (user, week) BEFORE "
    "any join — bounded by users × weeks, not event volume — and the "
    "cohort frame is a further reduction of it, so the join and both "
    "aggregates run on reduced frames sharing the user_id "
    "partitioning.",
)
def weekly_cohort_matrix(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    act = ev.select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
    ).distinct()
    coh = act.groupBy("user_id").agg(F.min("wk").alias("cwk"))
    return (
        act.join(coh, "user_id")
        .groupBy(
            F.date_format("cwk", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("datediff(wk, cwk) DIV 7").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


# --------------------------------------------------------------------------
@register(
    "events_activity_streaks",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
        SELECT user_id, day,
            day - CAST(row_number() OVER (
                PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
        FROM act
    ),
    streak AS (
        SELECT user_id, count(*) AS len
        FROM isl GROUP BY user_id, anchor
    )
    SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        max(len) AS longest_streak, count(*) AS n_streaks
    FROM streak GROUP BY user_id
    """,
    doc="Gaps-and-islands consecutive-day activity streaks per user "
    "(longest streak, streak count) — the classic retention metric. "
    "Activity is distinct-reduced to (user, day) BEFORE the window, "
    "so the row_number island trick and both aggregates run on a "
    "frame bounded by users × days, all sharing the user_id "
    "partitioning (one shuffle end-to-end after the distinct).",
)
def activity_streaks(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf)
    act = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = act.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    streak = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streak.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


# --------------------------------------------------------------------------
def _first_at_or_after(
    ev: DataFrame, base: DataFrame, etype: str, lower: str, out: str
) -> DataFrame:
    """For each row of the (already key-reduced) `base` frame, the
    first `etype` event at/after `lower` for the same user — the probe
    step shared by the funnel and conversion-latency censuses (one
    equi-join on user_id; the ts bound is a residual predicate)."""
    probe = ev.filter(F.col("event_type") == etype).select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    keys = list(base.columns)
    return (
        base.join(
            probe,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col(lower)),
            "left",
        )
        .groupBy(*keys)
        .agg(F.min("p_ts").alias(out))
    )


@register(
    "events_funnel_steps",
    oracle="""
    WITH u1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    u2 AS (
        SELECT u1.user_id, u1.t1, min(c.ts) AS t2
        FROM u1 LEFT JOIN events c
          ON c.user_id = u1.user_id AND c.event_type = 'click'
         AND c.ts >= u1.t1
        GROUP BY u1.user_id, u1.t1
    ),
    u3 AS (
        SELECT u2.user_id, u2.t1, u2.t2, min(p.ts) AS t3
        FROM u2 LEFT JOIN events p
          ON p.user_id = u2.user_id AND p.event_type = 'purchase'
         AND p.ts >= u2.t2
        GROUP BY u2.user_id, u2.t1, u2.t2
    )
    SELECT count(t1) AS n_view, count(t2) AS n_view_click,
        count(t3) AS n_full_funnel,
        count(t3) * 1000 // count(t1) AS full_permille
    FROM u3
    """,
    doc="Strictly-ordered three-step funnel (first view → first click "
    "at/after it → first purchase at/after that) with per-step user "
    "counts — the step-wise drop-off census behind "
    "events_funnel_view_purchase. Each probe is an equi-join on "
    "user_id against the already user-reduced previous step (the ts "
    "bound is a residual predicate); the final count aggregate sends "
    "only map-side partial counts through the global exchange.",
)
def funnel_steps(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    u1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    u2 = _first_at_or_after(ev, u1, "click", "t1", "t2")
    u3 = _first_at_or_after(ev, u2, "purchase", "t2", "t3")
    return u3.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_view_click"),
        F.count("t3").alias("n_full_funnel"),
        F.expr("count(t3) * 1000 DIV count(t1)").alias("full_permille"),
    )


# --------------------------------------------------------------------------
@register(
    "events_time_weighted_value",
    oracle="""
    WITH iv AS (
        SELECT user_id,
            CAST(value AS DECIMAL(18,2)) AS v,
            epoch_us(lead(ts) OVER (
                PARTITION BY user_id ORDER BY ts, event_id))
            - epoch_us(ts) AS dur_us
        FROM events
    )
    SELECT user_id, count(*) AS n_intervals,
        CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
        CAST(CAST(sum(v * CAST(dur_us AS DECIMAL(20,0))) AS VARCHAR)
             AS DOUBLE) / CAST(sum(dur_us) AS DOUBLE) AS twa_value
    FROM iv WHERE dur_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="Time-weighted average value per user (each reading holds "
    "until the next one — the IoT/billing integral, where a plain "
    "mean is wrong whenever sampling is irregular). One lead() window "
    "per user stream, exact decimal Σ(value·duration) so the sum "
    "order can't wiggle the hash, one double division at the edge.",
)
def time_weighted_value(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    wv = F.col("v") * F.col("dur_us").cast("decimal(20,0)")
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dur_us").alias("total_dur_us"),
        (
            F.sum(wv).cast("string").cast("double")
            / F.sum("dur_us").cast("double")
        ).alias("twa_value"),
    )


# --------------------------------------------------------------------------
_PATHS_TOPK = 20


@register(
    "events_top_paths",
    headline=True,  # round-5 stacked-window representative in the bench set
    oracle=f"""
    WITH s AS (
        SELECT user_id, ts, event_id, event_type,
            CAST(sum(new_session) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM (
            SELECT user_id, ts, event_id, event_type,
                CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                     > 3600000000 OR lag(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL THEN 1 ELSE 0 END AS new_session
            FROM events
        )
    ),
    tri AS (
        SELECT event_type || '>' || lead(event_type, 1) OVER w
            || '>' || lead(event_type, 2) OVER w AS path,
            CASE WHEN lead(session_id, 2) OVER w = session_id
                 THEN 1 ELSE 0 END AS same_session
        FROM s
        WINDOW w AS (PARTITION BY user_id, session_id
                     ORDER BY ts, event_id)
    )
    SELECT path, count(*) AS n FROM tri
    WHERE same_session = 1 AND path IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path LIMIT {_PATHS_TOPK}
    """,
    doc="Top event-type 3-step paths within user sessions (1 h gap, "
    "same gaps-and-islands boundary events_session_windows pins): "
    "the 'what do users do next' product-analytics staple. Both "
    "windows share one shuffle on user_id; path trigrams are built "
    "by lead() inside the session partition (no self-join, no "
    "explode); top-k is TakeOrderedAndProject with a deterministic "
    "(n DESC, path) boundary.",
)
def top_paths(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf)
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(
        F.lag("ts").over(wu)
    )
    s = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(
            F.when(gap_us > 3600000000, 1)
            .when(F.lag("ts").over(wu).isNull(), 1)
            .otherwise(0)
        )
        .over(wu.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    # concat (NOT concat_ws): the oracle's `||` nulls the whole path
    # when any step's event_type is NULL — concat_ws would silently
    # skip the NULL part and count a two-step path as a trigram. A
    # NULL path therefore already covers both "window ran off the
    # session end" and "NULL step inside the trigram".
    tri = s.select(
        F.concat(
            F.col("event_type"),
            F.lit(">"),
            F.lead("event_type", 1).over(ws),
            F.lit(">"),
            F.lead("event_type", 2).over(ws),
        ).alias("path"),
    )
    return (
        tri.filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(_PATHS_TOPK)
    )


# --------------------------------------------------------------------------
_ANOM_K, _ANOM_MIN_N = 3, 30


@register(
    "events_rolling_anomaly_census",
    oracle=f"""
    WITH src AS (
        -- TRY_CAST mirrors Spark's non-ANSI cast-to-NULL: a NaN or
        -- out-of-DECIMAL(18,2)-range double centifies to NULL and is
        -- EXCLUDED (the operator's contract), where a plain CAST
        -- would throw and a raw value-IS-NOT-NULL filter would
        -- diverge from the Spark paths on exactly those inputs.
        SELECT event_type, event_id, ts,
            CAST(TRY_CAST(TRY_CAST(value AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS DECIMAL(38,0)) AS x
        FROM events
        WHERE TRY_CAST(TRY_CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
              IS NOT NULL
    ),
    b AS (
        SELECT event_type, event_id, x,
            count(*) OVER w AS n,
            coalesce(sum(x) OVER w, 0) AS sx,
            coalesce(sum(x * x) OVER w, 0) AS sx2
        FROM src
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    d AS (
        SELECT event_type, event_id,
            n >= {_ANOM_MIN_N} AS is_scored,
            n >= {_ANOM_MIN_N} AND
            (CAST(n AS DECIMAL(38,0)) * x - sx)
              * (CAST(n AS DECIMAL(38,0)) * x - sx) * (n - 1)
            > {_ANOM_K * _ANOM_K}
              * (CAST(n AS DECIMAL(38,0)) * sx2 - sx * sx) * n
                AS is_anomaly
        FROM b
    )
    SELECT event_type, count(*) AS n_rows,
        CAST(sum(CASE WHEN is_scored THEN 1 ELSE 0 END) AS BIGINT)
            AS n_scored,
        CAST(sum(CASE WHEN is_anomaly THEN 1 ELSE 0 END) AS BIGINT)
            AS n_anomalies,
        min(CASE WHEN is_anomaly THEN event_id END) AS first_anomaly_id,
        max(CASE WHEN is_anomaly THEN event_id END) AS last_anomaly_id
    FROM d GROUP BY event_type
    """,
    doc="Rolling k-sigma anomaly census per event type: each reading "
    "judged against the exact mean/variance of its key's PRECEDING "
    "readings (k=3, warm-up 30). The k-sigma test is cross-multiplied "
    "into pure integer arithmetic over centified values — "
    "(n·x−Σx)²·(n−1) > k²·(n·Σx²−Σx²)·n in DECIMAL(38,0) — no mean, "
    "no sqrt, no float, so the decision is bit-identical on both "
    "engines AND identical to streaming/anomaly.py's stateful form, "
    "whose per-key state is the same three integers (equality pinned "
    "in tests/test_anomaly.py). One shuffle on the key; running "
    "integer windows, no second scan.",
)
def rolling_anomaly_census(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.streaming.anomaly import anomaly_plan_batch

    ev = _events(spark, sf)
    scored = anomaly_plan_batch(
        ev,
        key_col="event_type",
        value_col="value",
        order_cols=("ts", "event_id"),
        k=_ANOM_K,
        min_n=_ANOM_MIN_N,
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("is_scored"), 1).otherwise(0))
        .cast("long")
        .alias("n_scored"),
        F.sum(F.when(F.col("is_anomaly"), 1).otherwise(0))
        .cast("long")
        .alias("n_anomalies"),
        F.min(F.when(F.col("is_anomaly"), F.col("event_id")))
        .alias("first_anomaly_id"),
        F.max(F.when(F.col("is_anomaly"), F.col("event_id")))
        .alias("last_anomaly_id"),
    )


# --------------------------------------------------------------------------
@register(
    "events_gap_histogram",
    oracle="""
    WITH g AS (
        SELECT event_type,
            epoch_us(ts) - lag(epoch_us(ts)) OVER (
                PARTITION BY event_type, user_id
                ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT event_type,
        length(format('{:b}', gap_us)) AS bucket_log2,
        count(*) AS n,
        min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL AND gap_us > 0
    GROUP BY event_type, bucket_log2
    """,
    doc="Power-of-two inter-arrival gap histogram per event type (the "
    "HdrHistogram-lite observability shape: bucket = bitlen(gap_us), "
    "so bucket k holds gaps in [2^(k-1), 2^k)). Buckets come from the "
    "exact integer binary length — no float log2, no cross-engine ulp "
    "risk at power-of-two boundaries. One shuffle for the per-stream "
    "lag window, then a tiny keyed agg (|types| x ~40 buckets); "
    "zero/negative gaps (same-microsecond events) are excluded "
    "explicitly on both engines.",
)
def gap_histogram(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    w = Window.partitionBy("event_type", "user_id").orderBy(
        "ts", "event_id"
    )
    g = ev.select(
        "event_type",
        (
            F.unix_micros(F.col("ts"))
            - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    from scio_db_spark.functions.intmath import bitlen

    bucket = bitlen(F.col("gap_us"))
    return g.groupBy(
        "event_type", bucket.alias("bucket_log2")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


# --------------------------------------------------------------------------
@register(
    "events_purchase_attribution",
    oracle="""
    WITH attributed AS (
        SELECT event_type, value,
            last_value(CASE WHEN event_type <> 'purchase'
                            THEN event_type END IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                AS channel
        FROM events
    )
    SELECT coalesce(channel, 'none') AS channel,
        count(*) AS n_purchases,
        CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS VARCHAR)
             AS DOUBLE) AS attributed_value
    FROM attributed WHERE event_type = 'purchase'
    -- GROUP BY 1 binds the COALESCED alias; a bare "GROUP BY channel"
    -- resolves to the raw pre-coalesce column in DuckDB (verified),
    -- which would split a literal-'none' touch from the no-touch
    -- sentinel while Spark merges them.
    GROUP BY 1
    """,
    doc="Last-touch purchase attribution: each purchase credited to "
    "the user's most recent PRIOR non-purchase event type "
    "(ignore-nulls last_value over the user stream — the marketing "
    "attribution staple; 'none' = a purchase with no prior touch). "
    "One shuffle on user_id for the window, then a tiny channel agg; "
    "exact decimal value sums convert to double only at the edge.",
)
def purchase_attribution(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", "value", touch.alias("channel"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("channel"), F.lit("none")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("string")
            .cast("double")
            .alias("attributed_value"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "events_weekly_type_momentum",
    oracle="""
    WITH wk AS (
        SELECT event_type,
            CAST(date_trunc('week', ts) AS DATE) AS week,
            count(*) AS n
        FROM events GROUP BY event_type, week
    )
    SELECT event_type, CAST(week AS VARCHAR) AS week, n,
        n - lag(n) OVER (PARTITION BY event_type ORDER BY week)
            AS delta,
        CASE WHEN lag(n) OVER (PARTITION BY event_type ORDER BY week) > 0
             THEN (n - lag(n) OVER (PARTITION BY event_type
                                    ORDER BY week)) * 1000
                  // lag(n) OVER (PARTITION BY event_type ORDER BY week)
             END AS delta_permille
    FROM wk
    """,
    doc="Week-over-week volume momentum per event type (count, delta, "
    "integer permille change — the trend panel behind every ops "
    "dashboard). The lag window runs over the (type, week) AGGREGATE "
    "frame — bounded by types × weeks, never event volume — and the "
    "permille change is exact integer cross-division, no float "
    "ratios to wiggle cross-engine.",
)
def weekly_type_momentum(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    wk = ev.groupBy(
        "event_type",
        F.date_trunc("week", F.col("ts")).cast("date").alias("__wk"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("__wk")
    prev = F.lag("n").over(w)
    return wk.select(
        "event_type",
        F.date_format("__wk", "yyyy-MM-dd").alias("week"),
        "n",
        (F.col("n") - prev).alias("delta"),
        prev.alias("__prev"),
    ).select(
        "event_type",
        "week",
        "n",
        "delta",
        F.expr(
            "CASE WHEN __prev > 0 THEN (n - __prev) * 1000 DIV __prev END"
        ).alias("delta_permille"),
    )


# --------------------------------------------------------------------------
@register(
    "events_rolling_7d_actives",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    days AS (SELECT DISTINCT d AS day FROM act)
    SELECT CAST(days.day AS VARCHAR) AS day,
        count(DISTINCT a.user_id) AS n_active_7d
    FROM days JOIN act a
      ON a.d <= days.day AND a.d >= days.day - 6
    GROUP BY days.day
    """,
    doc="Trailing 7-day distinct active users per calendar day — the "
    "sliding COUNT(DISTINCT) Spark's window menu lacks (frames reject "
    "count(distinct)). The oracle is the naive range-join twin; the "
    "Spark plan is operators/sliding.rolling_distinct_count's "
    "CONTRIBUTION-EXPLODE form: distinct-reduce to (user, day) "
    "(bounded by users × days, not event volume), explode each active "
    "day to the ≤7 window-end days it feeds (data-independent ×7 "
    "amplification of the REDUCED frame), one count-distinct "
    "aggregation — no range join, no per-day fact re-scan at 100 TB.",
)
def rolling_7d_actives(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.sliding import rolling_distinct_count

    ev = _events(spark, sf)
    out = rolling_distinct_count(
        ev, "user_id", "ts", 7, out_col="n_active_7d"
    )
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"), "n_active_7d"
    )


# --------------------------------------------------------------------------
@register(
    "events_scd2_user_state",
    oracle="""
    WITH runs AS (
        SELECT user_id, event_type, ts, event_id,
            CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, event_type, ts, chg,
            sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS version,
            min(CASE WHEN chg = 1 THEN ts END) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
            ) AS next_change_ts
        FROM runs
    )
    SELECT user_id, CAST(version AS BIGINT) AS version,
        min(event_type) AS state,
        min(ts) AS valid_from,
        min(next_change_ts) AS valid_to,
        count(*) AS n_events,
        (min(next_change_ts) IS NULL) AS is_current
    FROM numbered GROUP BY user_id, version
    """,
    doc="SCD Type-2 state history per user: one row per consecutive "
    "run of equal event_type with valid_from/valid_to/version/"
    "is_current — the warehouse change-tracking shape, and the batch "
    "materialization of the per-key latest-state tracking the "
    "reference's MediationService keeps in keyed state "
    "(MediationService.scala). ONE hash shuffle on user_id serves "
    "change detection (lag), run numbering (running sum), and the "
    "forward-min next-change timestamp — valid_to is resolved BEFORE "
    "the collapse so no window ever runs on the collapsed frame, and "
    "the forward min runs on a reversed-sort incremental frame (the "
    "UNBOUNDED FOLLOWING form is O(n^2) per key in Spark); see "
    "operators/scd2.py for the plan rationale.",
)
def scd2_user_state(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.scd2 import scd2_from_log

    ev = table(spark, sf, "events")
    out = scd2_from_log(
        ev, key_col="user_id", attr_col="event_type",
        ts_col="ts", tie_col="event_id",
    )
    return out.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "state",
        "valid_from",
        "valid_to",
        "n_events",
        "is_current",
    )


# --------------------------------------------------------------------------
_HH_PHI_INV = 128  # heavy = more than 1/128 of all events


@register(
    "events_heavy_users_exact",
    headline=True,
    oracle=f"""
    SELECT user_id, count(*) AS cnt
    FROM events GROUP BY user_id
    HAVING count(*) * {_HH_PHI_INV} > (SELECT count(*) FROM events)
    """,
    doc="Exact heavy hitters: users holding more than 1/128 of all "
    "events. The oracle is the naive full GROUP BY; the Spark plan "
    "is the two-phase mergeable Misra-Gries form "
    "(operators/heavyhitters.py) — a map-only candidate pass whose "
    "summaries guarantee a superset of every phi-heavy key, then an "
    "exact count restricted to candidates via broadcast semi-join, "
    "with an integer cross-multiplied threshold. The sketch can only "
    "change WHAT gets exactly counted, never the result, which is "
    "what makes an approximate summary safely hash-checkable. At "
    "100 TB the naive form shuffles every distinct key; this "
    "shuffles only candidates.",
)
def heavy_users_exact(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.heavyhitters import heavy_hitters_exact

    ev = table(spark, sf, "events")
    return heavy_hitters_exact(ev, "user_id", phi_inv=_HH_PHI_INV)


# --------------------------------------------------------------------------
@register(
    "events_salted_agg_census",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
            AS total_cents,
        max(CAST(floor(value * 100) AS BIGINT)) AS max_cents
    FROM events GROUP BY user_id
    """,
    doc="Salted two-phase aggregation census: per-user count / exact "
    "cents sum / max computed via operators/skew.salted_agg "
    "(phase 1 on (key, salt) spreads a hot key over 16 reducers, "
    "phase 2 merges partials on the key) — the skewed-aggregation "
    "fix AQE doesn't cover. The salt is a deterministic content "
    "hash (xxhash64 mod 16), retry-safe by construction; the merged "
    "output is salt-independent for algebraic aggregates over exact "
    "integers, which is precisely what this hash-checked row proves "
    "on real data. The oracle is the plain one-phase GROUP BY.",
)
def salted_agg_census(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.skew import salted_agg

    ev = _events(spark, sf).select(
        "user_id",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("vc"),
    )
    return salted_agg(
        ev,
        ["user_id"],
        {
            "n": ("count", F.lit(1)),
            "total_cents": ("sum", "vc"),
            "max_cents": ("max", "vc"),
        },
        n_salts=16,
    )


# --------------------------------------------------------------------------
_EPS_CENTS = 5


@register(
    "events_value_twins_eps",
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, event_type,
            CAST(floor(value * 100) AS BIGINT) AS cents,
            CAST(ts AS DATE) AS d
        FROM events
    )
    SELECT a.event_id AS event_a, b.event_id AS event_b,
        a.cents AS cents_a, b.cents AS cents_b
    FROM e a JOIN e b
      ON a.event_type = b.event_type AND a.d = b.d
     AND a.event_id < b.event_id AND a.user_id <> b.user_id
     AND abs(a.cents - b.cents) <= {_EPS_CENTS}
    """,
    doc="Coordinated-value screen: pairs of same-type same-day events "
    "from DIFFERENT users whose amounts agree within 5 cents — the "
    "near-equality self-join Spark has no native strategy for (the "
    "theta join plans as a nested loop). Banding makes it an "
    "equi-join: width-eps buckets, 3-band probe, exact filter "
    "(operators/bandjoin.py — every qualifying pair meets exactly "
    "once because the build side holds one band per row). Oracle = "
    "the naive range join, which DuckDB's IEJoin can afford at gate "
    "SF. Scale: |bands| = |events|, fan-out 3x, shuffle keyed on "
    "(type, day, band) — skew-splittable by AQE.",
)
def events_value_twins_eps(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.bandjoin import epsilon_self_join

    e = table(spark, sf, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        F.col("ts").cast("date").alias("d"),
    )
    pairs = epsilon_self_join(
        e.select("event_id", "event_type", "d", "cents", "user_id"),
        id_col="event_id",
        value_col="cents",
        eps=_EPS_CENTS,
        partition_cols=["event_type", "d"],
    )
    # the operator keeps only partition/id/value columns: re-attach
    # user ids to filter same-user pairs out
    u = e.select("event_id", "user_id")
    return (
        pairs.join(
            u.select(
                F.col("event_id").alias("event_id_a"),
                F.col("user_id").alias("ua"),
            ),
            "event_id_a",
        )
        .join(
            u.select(
                F.col("event_id").alias("event_id_b"),
                F.col("user_id").alias("ub"),
            ),
            "event_id_b",
        )
        .filter(F.col("ua") != F.col("ub"))
        .select(
            F.col("event_id_a").alias("event_a"),
            F.col("event_id_b").alias("event_b"),
            "cents_a",
            "cents_b",
        )
    )


# --------------------------------------------------------------------------
# nullif guards the degenerate pooled variance (p = 0 or 1 — e.g.
# every user converted): x/0.0 is NULL in non-ANSI Spark, an error in
# ANSI Spark, and Inf in DuckDB — nullif makes all engines agree on
# NULL ("test undefined"), the round-2 cosine_sql lesson.
_AB_Z_EXPR = (
    "((CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE)) - "
    "(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE))) / "
    "nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) "
    "/ CAST(n_a + n_b AS DOUBLE)) "
    "* (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) "
    "* (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 0.0)"
)


@register(
    "events_ab_test_census",
    oracle=f"""
    WITH assign AS (
        SELECT user_id, user_id % 2 AS variant,
            max(CASE WHEN event_type = 'purchase' AND value > 80
                     THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ),
    counts AS (
        SELECT
            CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a,
            CAST(sum(CASE WHEN variant = 0 THEN converted ELSE 0 END)
                AS BIGINT) AS conv_a,
            CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b,
            CAST(sum(CASE WHEN variant = 1 THEN converted ELSE 0 END)
                AS BIGINT) AS conv_b
        FROM assign
    )
    SELECT n_a, conv_a, n_b, conv_b, {_AB_Z_EXPR} AS z
    FROM counts
    """,
    doc="Two-proportion A/B test: users split by id parity, "
    "conversion = any high-value purchase (value > 80; plain "
    "any-purchase saturates at gate SF and degenerates the "
    "variance); emits the per-variant counts and the "
    "pooled two-proportion z-score — the experimentation primitive a "
    "product pipeline runs at every rollout. The z-score is a RAW "
    "double yet hash-exact across engines: it is one fixed expression "
    "tree over integer counts using only +,-,*,/ and sqrt, all of "
    "which IEEE-754 requires to be correctly rounded (unlike ln/exp, "
    "which force this repo's other float outputs through quantization "
    "— see docs_bm25_scores). Plan: one user-grain aggregation, one "
    "global census row of map-side partials.",
)
def ab_test_census(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    assign = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 80),
                1,
            ).otherwise(0)
        ).alias("converted")
    ).withColumn("variant", F.col("user_id") % 2)
    counts = assign.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    return counts.select(
        "n_a", "conv_a", "n_b", "conv_b", F.expr(_AB_Z_EXPR).alias("z")
    )


# --------------------------------------------------------------------------
_FUNNEL_WINDOW_DAYS = 7


def _first_within(
    ev: DataFrame,
    base: DataFrame,
    etype: str,
    lower: str,
    out: str,
    window_days: int,
) -> DataFrame:
    """Bounded variant of _first_at_or_after: the first `etype` event
    in [lower, lower + window_days] per user (NULL when the previous
    step is NULL — the join bound is NULL-safe by SQL semantics)."""
    probe = ev.filter(F.col("event_type") == etype).select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    keys = list(base.columns)
    return (
        base.join(
            probe,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_ts") >= F.col(lower))
            & (
                F.col("p_ts")
                <= F.col(lower)
                + F.expr(f"INTERVAL {window_days} DAYS")
            ),
            "left",
        )
        .groupBy(*keys)
        .agg(F.min("p_ts").alias(out))
    )


@register(
    "events_windowed_funnel_census",
    oracle=f"""
    WITH u1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    u2 AS (
        SELECT u1.user_id, u1.t1, min(v.ts) AS t2
        FROM u1 LEFT JOIN events v
          ON v.user_id = u1.user_id AND v.event_type = 'view'
         AND v.ts >= u1.t1
         AND v.ts <= u1.t1 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
        GROUP BY u1.user_id, u1.t1
    ),
    u3 AS (
        SELECT u2.user_id, u2.t1, u2.t2, min(c.ts) AS t3
        FROM u2 LEFT JOIN events c
          ON c.user_id = u2.user_id AND c.event_type = 'click'
         AND c.ts >= u2.t2
         AND c.ts <= u2.t2 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
        GROUP BY u2.user_id, u2.t1, u2.t2
    ),
    u4 AS (
        SELECT u3.user_id, u3.t1, u3.t2, u3.t3, min(p.ts) AS t4
        FROM u3 LEFT JOIN events p
          ON p.user_id = u3.user_id AND p.event_type = 'purchase'
         AND p.ts >= u3.t3
         AND p.ts <= u3.t3 + INTERVAL {_FUNNEL_WINDOW_DAYS} DAY
        GROUP BY u3.user_id, u3.t1, u3.t2, u3.t3
    )
    SELECT CAST(count(t1) AS BIGINT) AS n_signup,
        CAST(count(t2) AS BIGINT) AS n_view_7d,
        CAST(count(t3) AS BIGINT) AS n_click_7d,
        CAST(count(t4) AS BIGINT) AS n_purchase_7d,
        count(t2) * 1000 // count(t1) AS view_permille,
        CASE WHEN count(t2) = 0 THEN NULL
             ELSE count(t3) * 1000 // count(t2) END AS click_permille,
        CASE WHEN count(t3) = 0 THEN NULL
             ELSE count(t4) * 1000 // count(t3) END
            AS purchase_permille
    FROM u4
    """,
    doc="TIME-BOUNDED ordered funnel: signup → view → click → "
    f"purchase, each step within {_FUNNEL_WINDOW_DAYS} days of the "
    "PREVIOUS step's event (the product-analytics funnel with "
    "attribution windows — the unbounded events_funnel_steps "
    "overstates conversion for long-lived users). Each step is one "
    "equi-join on user_id against the already user-reduced previous "
    "frame with both time bounds as residual predicates; the census "
    "aggregates one row per signup user. Step rates in exact integer "
    "permille.",
)
def windowed_funnel_census(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    u1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    u2 = _first_within(ev, u1, "view", "t1", "t2", _FUNNEL_WINDOW_DAYS)
    u3 = _first_within(ev, u2, "click", "t2", "t3", _FUNNEL_WINDOW_DAYS)
    u4 = _first_within(
        ev, u3, "purchase", "t3", "t4", _FUNNEL_WINDOW_DAYS
    )
    return u4.agg(
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_view_7d"),
        F.count("t3").alias("n_click_7d"),
        F.count("t4").alias("n_purchase_7d"),
    ).select(
        "n_signup",
        "n_view_7d",
        "n_click_7d",
        "n_purchase_7d",
        F.expr("n_view_7d * 1000 DIV n_signup").alias("view_permille"),
        F.expr(
            "CASE WHEN n_view_7d = 0 THEN NULL "
            "ELSE n_click_7d * 1000 DIV n_view_7d END"
        ).alias("click_permille"),
        F.expr(
            "CASE WHEN n_click_7d = 0 THEN NULL "
            "ELSE n_purchase_7d * 1000 DIV n_click_7d END"
        ).alias("purchase_permille"),
    )


# --------------------------------------------------------------------------
# Multi-touch attribution: the position-aware sibling of the
# last-touch census above. Every purchase splits exactly 1,000,000
# micro-credits equally across the user's non-purchase touches in the
# 7 days before it; integer floor-division would leak the remainder,
# so the touch CLOSEST to the purchase (latest ts, event_id
# tie-break) receives it — total credit is conserved exactly,
# purchase-for-purchase, and every reported number is an exact BIGINT.
@register(
    "events_multitouch_attribution",
    oracle="""
    WITH p AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
        WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT p.p_id, e.event_type, e.ts, e.event_id,
            CAST(count(*) OVER (PARTITION BY p.p_id) AS BIGINT) AS n,
            CAST(row_number() OVER (
                PARTITION BY p.p_id
                ORDER BY e.ts DESC, e.event_id DESC) AS BIGINT) AS rn
        FROM p JOIN events e
          ON e.user_id = p.user_id
         AND e.ts < p.p_ts
         AND e.ts >= p.p_ts - INTERVAL 7 DAY
         AND e.event_type <> 'purchase'
    ),
    credited AS (
        SELECT event_type,
            1000000 // n
            + CASE WHEN rn = 1 THEN 1000000 % n ELSE 0 END AS credit
        FROM t
    ),
    unattributed AS (
        SELECT 'none' AS channel,
            CAST(count(*) AS BIGINT) AS n_touches,
            CAST(count(*) * 1000000 AS BIGINT) AS credit_micro
        FROM p WHERE p_id NOT IN (SELECT p_id FROM t)
    )
    SELECT channel, n_touches, credit_micro FROM (
        SELECT event_type AS channel,
            CAST(count(*) AS BIGINT) AS n_touches,
            CAST(sum(credit) AS BIGINT) AS credit_micro
        FROM credited GROUP BY event_type
        UNION ALL
        SELECT * FROM unattributed WHERE n_touches > 0
    ) ORDER BY channel
    """,
    doc="Multi-touch (linear) purchase attribution: each purchase "
    "splits exactly 1e6 micro-credits equally across the user's "
    "non-purchase touches in the prior 7 days, remainder to the "
    "closest touch (conservation is exact — pinned in pytest as "
    "sum(credit) == 1e6 * attributed purchases). Touch discovery is "
    "a user-key equi-join with a bounded time-range residual (the "
    "events_orders_range_count shape — never a cartesian), then one "
    "per-purchase window and a channel rollup. 'none' row counts "
    "touch-less purchases at full credit.",
)
def multitouch_attribution(spark: SparkSession, sf: str) -> DataFrame:
    ev = _events(spark, sf)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    e = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", "event_type", "ts", "event_id"
    )
    t = p.join(
        e,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("ts") < F.col("p_ts"))
        & (F.col("ts") >= F.expr("p_ts - INTERVAL 7 DAY")),
    )
    wp = Window.partitionBy("p_id")
    wr = Window.partitionBy("p_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    credited = t.select(
        "p_id",
        "event_type",
        F.count(F.lit(1)).over(wp).alias("n"),
        F.row_number().over(wr).cast("long").alias("rn"),
    ).select(
        "p_id",
        "event_type",
        (
            F.expr("1000000 DIV n")
            + F.when(F.col("rn") == 1, F.expr("1000000 % n")).otherwise(
                F.lit(0)
            )
        ).alias("credit"),
    )
    channels = credited.groupBy(
        F.col("event_type").alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("credit").alias("credit_micro"),
    )
    none_row = (
        p.join(
            credited.select("p_id").distinct(), "p_id", "left_anti"
        )
        .agg(F.count(F.lit(1)).alias("n_touches"))
        .filter(F.col("n_touches") > 0)
        .select(
            F.lit("none").alias("channel"),
            "n_touches",
            (F.col("n_touches") * 1_000_000).alias("credit_micro"),
        )
    )
    return channels.unionByName(none_row).orderBy("channel")


# --------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k theta) sketch: the set-OPERATION
# sketch. HLL register tables (above) merge by max for unions, but
# cannot answer intersections — "how many users were active on BOTH
# days" at 100 TB either re-shuffles raw keys per day-pair or uses a
# bottom-k sketch: keep the K smallest md5 hashes per partition
# (deterministic — no sampling seed), then ANY pair's union estimate
# is (K-1)*2^60 / t_K over the merged bottom-K, and the Jaccard
# numerator is how many of the union's bottom-K appear in BOTH
# sketches (Beyer et al. 2007, the KMV estimator; the theta-sketch
# algebra in the DataSketches line). Day sketches are K longs each —
# 40 days x K=128 is five kilobytes of state for all pairwise overlap
# questions.
_KMV_K = 128
_KMV_SCALE = 1 << 60  # hash domain: str_hash60 is uniform in [0, 2^60)


def _kmv_overlap_oracle() -> str:
    from scio_db_spark.functions.hashing import str_hash60_sql

    uid = str_hash60_sql("CAST(user_id AS VARCHAR)")
    k = _KMV_K
    return f"""
    WITH dh AS (
        SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
            {uid} AS h
        FROM events
    ),
    sk AS (
        SELECT day, (list_sort(list(h)))[1:{k}] AS ks
        FROM dh GROUP BY day
    ),
    ex AS (
        SELECT a.day AS day_a, b.day AS day_b,
            CAST(count(*) AS BIGINT) AS inter_exact
        FROM dh a JOIN dh b ON a.h = b.h AND a.day < b.day
        GROUP BY a.day, b.day
    ),
    pairs AS (
        SELECT a.day AS day_a, b.day AS day_b,
            list_sort(list_distinct(list_concat(a.ks, b.ks))) AS merged,
            a.ks AS ka, b.ks AS kb
        FROM sk a JOIN sk b ON a.day < b.day
    ),
    est AS (
        SELECT day_a, day_b,
            least({k}, len(merged)) AS k_used,
            CAST(len(list_filter(merged[1:{k}],
                x -> list_contains(ka, x) AND list_contains(kb, x)))
                AS BIGINT) AS jac_num,
            CASE WHEN len(merged) >= {k}
                 THEN CAST((CAST({k - 1} AS HUGEINT) * {_KMV_SCALE})
                           // merged[{k}] AS BIGINT)
                 ELSE CAST(len(merged) AS BIGINT) END AS union_est
        FROM pairs
    )
    SELECT est.day_a, est.day_b,
        CAST(est.k_used AS BIGINT) AS k_used,
        est.jac_num,
        est.union_est,
        CAST((CAST(est.jac_num AS HUGEINT) * est.union_est)
             // est.k_used AS BIGINT) AS inter_est,
        coalesce(ex.inter_exact, 0) AS inter_exact
    FROM est LEFT JOIN ex
        ON est.day_a = ex.day_a AND est.day_b = ex.day_b
    ORDER BY est.day_a, est.day_b
    """


@register(
    "events_user_overlap_kmv_census",
    oracle=_kmv_overlap_oracle(),
    doc="Day-pair user-overlap census via deterministic KMV bottom-k "
    "sketches (K=128 smallest md5-derived hashes per day): union "
    "size from the classic (K-1)/t_K estimator, intersection from "
    "the Jaccard numerator over the merged bottom-K — the set "
    "operation HLL cannot do. Building the sketches is one "
    "rank-window per day (Catalyst's WindowGroupLimit keeps it a "
    "per-partition partial top-k before the exchange); every "
    "pairwise question afterwards runs on K-long arrays — at 100 TB "
    "the day-pair join touches kilobytes. The inter_exact column is "
    "the embedded verification twin (a raw self-join production "
    "would drop); estimator arithmetic is DECIMAL(38,0)/HUGEINT "
    "floor-div — exact integers in both engines.",
)
def events_user_overlap_kmv_census(
    spark: SparkSession, sf: str
) -> DataFrame:
    from scio_db_spark.functions.hashing import str_hash60

    k = _KMV_K
    e = table(spark, sf, "events")
    dh = e.select(
        F.to_date("ts").cast("string").alias("day"),
        str_hash60(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("day").orderBy("h"))
    sk = (
        dh.withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .groupBy("day")
        .agg(F.sort_array(F.collect_list("h")).alias("ks"))
    )
    a, b = sk.alias("a"), sk.alias("b")
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).select(
        F.col("a.day").alias("day_a"),
        F.col("b.day").alias("day_b"),
        F.array_sort(
            F.array_union(F.col("a.ks"), F.col("b.ks"))
        ).alias("merged"),
        F.col("a.ks").alias("ka"),
        F.col("b.ks").alias("kb"),
    )
    est = pairs.select(
        "day_a",
        "day_b",
        F.least(F.lit(k), F.size("merged")).cast("long").alias("k_used"),
        F.size(
            F.array_intersect(
                F.array_intersect(
                    F.slice("merged", 1, k), F.col("ka")
                ),
                F.col("kb"),
            )
        ).cast("long").alias("jac_num"),
        F.when(
            F.size("merged") >= k,
            F.expr(
                f"CAST(CAST({k - 1} AS DECIMAL(38,0)) * {_KMV_SCALE} "
                f"DIV element_at(merged, {k}) AS BIGINT)"
            ),
        )
        .otherwise(F.size("merged").cast("long"))
        .alias("union_est"),
    )
    ex = (
        dh.alias("x")
        .join(
            dh.alias("y"),
            (F.col("x.h") == F.col("y.h"))
            & (F.col("x.day") < F.col("y.day")),
        )
        .groupBy(
            F.col("x.day").alias("day_a"), F.col("y.day").alias("day_b")
        )
        .agg(F.count(F.lit(1)).alias("inter_exact"))
    )
    return (
        est.join(ex, ["day_a", "day_b"], "left")
        .select(
            "day_a",
            "day_b",
            "k_used",
            "jac_num",
            "union_est",
            F.expr(
                "CAST(CAST(jac_num AS DECIMAL(38,0)) * union_est "
                "DIV k_used AS BIGINT)"
            ).alias("inter_est"),
            F.coalesce(F.col("inter_exact"), F.lit(0)).alias(
                "inter_exact"
            ),
        )
        .orderBy("day_a", "day_b")
    )
