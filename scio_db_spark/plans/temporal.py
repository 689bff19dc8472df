"""Temporal / change-data operators: PIT lookup, CDC diff, drift, trends.

The reference's mediation keeps only the LATEST state per key in
streaming state (MediationService.scala); this module is the batch
warehouse counterpart family around change tracking:

- point-in-time lookup against SCD2 history (operators/scd2.py +
  operators/asof.py composed),
- snapshot-diff CDC (operators/cdc.py),
- incremental aggregate maintenance (operators/incremental.py),
- CUSUM drift detection (operators/cusum.py),
- per-key least-squares trends (exact-integer regression sums).

Float policy: every sum is over integers quantized BEFORE aggregation
(cents, seconds) held in BIGINT/DECIMAL(38,0); the only float ops are
final divisions of exact decimals via the string round-trip (the
plans/relational.py policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from scio_db_spark.plans.catalog import table
from scio_db_spark.plans.registry import register


def _events(spark: SparkSession, sf: str) -> DataFrame:
    return table(spark, sf, "events")


# --------------------------------------------------------------------------
_PIT_MAX_CUST = 100
_PIT_GRID_START = "1995-01-01 00:00:00"
_PIT_GRID_END = "2001-07-01 00:00:00"


@register(
    "orders_scd2_pit_lookup",
    oracle=f"""
    WITH runs AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
            CASE WHEN lag(o_orderpriority) OVER w
                      IS DISTINCT FROM o_orderpriority
                 THEN 1 ELSE 0 END AS chg
        FROM orders WHERE o_custkey <= {_PIT_MAX_CUST}
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    ),
    hist AS (
        SELECT o_custkey, CAST(version AS BIGINT) AS version,
            min(o_orderpriority) AS state,
            min(o_orderdate) AS valid_from
        FROM (
            SELECT o_custkey, o_orderpriority, o_orderdate,
                sum(chg) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS UNBOUNDED PRECEDING) AS version
            FROM runs
        ) GROUP BY o_custkey, version
    ),
    dedup AS (
        -- one state per (key, valid_from): several runs can begin at
        -- the same date-granular instant; the LAST (max version) is
        -- "the state after all same-instant changes" — the same tie
        -- rule the Spark as-of operator applies via tie_col.
        SELECT o_custkey, version, state, valid_from FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_custkey, valid_from
                ORDER BY version DESC) AS rn
            FROM hist
        ) WHERE rn = 1
    ),
    grid AS (
        SELECT c.o_custkey AS cust,
            unnest(generate_series(TIMESTAMP '{_PIT_GRID_START}',
                                   TIMESTAMP '{_PIT_GRID_END}',
                                   INTERVAL 3 MONTH)) AS grid_ts
        FROM (SELECT DISTINCT o_custkey FROM orders
              WHERE o_custkey <= {_PIT_MAX_CUST}) c
    )
    SELECT g.cust AS o_custkey, g.grid_ts,
        d.state AS state_at, d.version AS version_at
    FROM grid g ASOF LEFT JOIN dedup d
      ON g.cust = d.o_custkey AND g.grid_ts >= d.valid_from
    """,
    doc="Point-in-time dimension lookup: for every (customer, quarter)"
    " probe, the customer's order-priority state and version per the "
    "SCD2 history built from the order log — 'what did the dimension "
    "say at time T', the query SCD2 history exists to answer. "
    "Composes scd2_from_log (one shuffle) with the union+last_value "
    "as-of operator (one more shuffle of |probes|+|history| rows, no "
    "inequality join) — history rows per key are run counts, already "
    "reduced, so the probe join never touches fact volume. NULL "
    "state before a customer's first order.",
)
def scd2_pit_lookup(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.asof import asof_join
    from scio_db_spark.operators.scd2 import scd2_from_log

    o = table(spark, sf, "orders").filter(
        F.col("o_custkey") <= _PIT_MAX_CUST
    )
    hist = scd2_from_log(
        o,
        key_col="o_custkey",
        attr_col="o_orderpriority",
        ts_col="o_orderdate",
        tie_col="o_orderkey",
    ).select(
        "o_custkey",
        F.col("version").cast("long").alias("version_at"),
        F.col("state").alias("state_at"),
        "valid_from",
    )
    probes = (
        o.select("o_custkey")
        .distinct()
        .select(
            "o_custkey",
            F.explode(
                F.expr(
                    f"sequence(TIMESTAMP '{_PIT_GRID_START}', "
                    f"TIMESTAMP '{_PIT_GRID_END}', INTERVAL 3 MONTH)"
                )
            ).alias("grid_ts"),
        )
    )
    return asof_join(
        probes,
        hist,
        key="o_custkey",
        left_time="grid_ts",
        right_time="valid_from",
        payload_cols=["state_at", "version_at"],
        tie_col="version_at",
    )


# --------------------------------------------------------------------------
@register(
    "events_next_purchase_asof",
    oracle="""
    WITH v AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'view'
    ),
    p AS (
        -- forward tie contract: one candidate per (user, instant),
        -- max event_id wins (same dedup the Spark operator applies)
        SELECT user_id, ts, event_id, value FROM (
            SELECT user_id, ts, event_id, value,
                row_number() OVER (PARTITION BY user_id, ts
                                   ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'purchase'
        ) WHERE rn = 1
    )
    SELECT v.event_id, v.user_id, v.ts,
        p.event_id AS next_purchase_id,
        p.ts AS next_purchase_ts,
        p.value AS next_purchase_value
    FROM v ASOF LEFT JOIN p
      ON v.user_id = p.user_id AND v.ts <= p.ts
    """,
    doc="FORWARD as-of join: for every view event, the user's next "
    "purchase at-or-after it (time-to-conversion lookups). Same "
    "union + running last(ignorenulls) merge as the backward form, "
    "scanned in descending time order — one keyed shuffle of "
    "|views|+|purchases| rows, no inequality join "
    "(operators/asof.py direction='forward'); oracle = DuckDB "
    "native ASOF with the <= comparator. NULL payload for views "
    "after the user's last purchase.",
)
def next_purchase_asof(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.asof import asof_join

    ev = _events(spark, sf)
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("next_purchase_id"),
        F.col("value").alias("next_purchase_value"),
        F.col("ts").alias("next_purchase_ts"),
    )
    return asof_join(
        views,
        purchases,
        key="user_id",
        left_time="ts",
        right_time="ts",
        payload_cols=[
            "next_purchase_id",
            "next_purchase_ts",
            "next_purchase_value",
        ],
        tie_col="next_purchase_id",
        direction="forward",
    )


# --------------------------------------------------------------------------
@register(
    "events_type_trend_slope",
    oracle="""
    WITH q AS (
        SELECT event_type,
            (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01'))
                // 1000000 AS x,
            CAST(floor(value * 100) AS BIGINT) AS y
        FROM events
    ),
    s AS (
        SELECT event_type, CAST(count(*) AS DECIMAL(38,0)) AS n,
            CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
            CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
            CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0))
                AS sxy,
            CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0))
                AS sxx
        FROM q GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
        CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
        / CAST(CAST(n * sxx - sx * sx AS VARCHAR) AS DOUBLE)
        AS slope_cents_per_sec
    FROM s
    """,
    doc="Per-key least-squares trend: OLS slope of event value (cents)"
    " vs time (seconds) per event type — 'is this metric drifting', "
    "grouped. One hash aggregation computing the five regression sums "
    "(n, Σx, Σy, Σxy, Σx²) map-side in DECIMAL(38,0) over integers "
    "quantized BEFORE summing (the docs_zipf_fit policy, here per "
    "key); slope = one final division of two exact decimals. The "
    "epoch origin shift (2024-01-01) only bounds magnitudes — "
    "n·Σxy−ΣxΣy and n·Σx²−(Σx)² are exactly shift-invariant in "
    "integer arithmetic, so the result is timezone-offset-proof. At "
    "100 TB this is a plain partial-aggregated groupBy: no window, "
    "no sort, one shuffle of |keys| rows.",
)
def type_trend_slope(spark: SparkSession, sf: str) -> DataFrame:
    q = _events(spark, sf).select(
        "event_type",
        F.expr(
            "(unix_micros(ts) - unix_micros(TIMESTAMP '2024-01-01 "
            "00:00:00')) DIV 1000000"
        ).alias("x"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("y"),
    )
    dec = "decimal(38,0)"
    s = q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).cast(dec).alias("sx"),
        F.sum(F.col("y").cast(dec)).cast(dec).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast(dec).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast(dec).alias("sxx"),
    )

    def _d2d(col):
        return col.cast("string").cast("double")

    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_events"),
        (
            _d2d(F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / _d2d(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        ).alias("slope_cents_per_sec"),
    )


# --------------------------------------------------------------------------
_CUSUM_TARGET = 6000  # cents; slightly above the value mean -> upper CUSUM
_CUSUM_H = 40000  # alarm threshold in cents


@register(
    "events_cusum_drift_census",
    oracle=f"""
    WITH d AS (
        SELECT event_type, ts, event_id,
            CAST(floor(value * 100) AS BIGINT) - {_CUSUM_TARGET} AS d
        FROM events
    ),
    p AS (
        SELECT event_type, ts, event_id,
            CAST(sum(d) OVER w AS BIGINT) AS p
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    s AS (
        SELECT event_type, ts, event_id,
            p - least(CAST(0 AS BIGINT),
                      CAST(min(p) OVER w AS BIGINT)) AS s
        FROM p
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    ),
    c AS (
        SELECT event_type, ts, s,
            CASE WHEN s > {_CUSUM_H}
                  AND coalesce(lag(s) OVER (PARTITION BY event_type
                      ORDER BY ts, event_id), 0) <= {_CUSUM_H}
                 THEN 1 ELSE 0 END AS alarm
        FROM s
    )
    SELECT event_type, CAST(sum(alarm) AS BIGINT) AS n_crossings,
        min(CASE WHEN alarm = 1 THEN ts END) AS first_alarm_ts,
        CAST(max(s) AS BIGINT) AS max_cusum
    FROM c GROUP BY event_type
    """,
    doc="CUSUM drift detection per event type: up-crossings of the "
    "zero-floored cumulative-sum statistic over cents, via the "
    "closed form S_i = P_i - min(0, running-min P) — the 'inherently "
    "sequential' recurrence becomes two stacked running aggregates "
    "plus a lag over ONE (key, ts) sort, all JVM-side on a single "
    "shuffle (operators/cusum.py). Exact integer arithmetic "
    "end-to-end; complements the k-sigma detector "
    "(events_rolling_anomaly_census): k-sigma flags point outliers, "
    "CUSUM accumulates evidence of small persistent mean shifts.",
)
def cusum_drift_census(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.cusum import cusum_crossings

    return cusum_crossings(
        _events(spark, sf),
        key_col="event_type",
        ts_col="ts",
        tie_col="event_id",
        value_col=F.expr("CAST(floor(value * 100) AS BIGINT)"),
        target=_CUSUM_TARGET,
        threshold=_CUSUM_H,
    )


# --------------------------------------------------------------------------
@register(
    "orders_snapshot_cdc_diff",
    headline=True,  # round-6 change-tracking family representative
    oracle="""
    WITH snap_old AS (
        SELECT o_orderkey, o_orderstatus AS status,
            o_totalprice AS total
        FROM orders WHERE o_orderkey % 7 <> 0
    ),
    snap_new AS (
        SELECT o_orderkey,
            CASE WHEN o_orderkey % 11 = 0 THEN 'X'
                 ELSE o_orderstatus END AS status,
            o_totalprice AS total
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
        CASE WHEN o.o_orderkey IS NULL THEN 'I'
             WHEN n.o_orderkey IS NULL THEN 'D'
             ELSE 'U' END AS op,
        o.status AS old_status, n.status AS new_status,
        o.total AS old_total, n.total AS new_total
    FROM snap_old o FULL OUTER JOIN snap_new n
      ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.status IS DISTINCT FROM n.status
       OR o.total IS DISTINCT FROM n.total
    """,
    doc="Snapshot-diff CDC: derive the insert/update/delete feed from "
    "two full table snapshots (operators/cdc.py) — the bridge from "
    "snapshot-only upstreams (the reference's bounded initial-load "
    "reread, HCEngine.scala) to incremental consumers. The two "
    "snapshots are deterministic arithmetic slices of orders "
    "(drop-every-7th vs drop-every-5th with every-11th's status "
    "mutated), so inserts, deletes and updates are all exercised. "
    "One key-partitioned full outer join; unchanged rows filtered in "
    "the same stage, output ~ change volume.",
)
def snapshot_cdc_diff(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.cdc import snapshot_diff

    o = table(spark, sf, "orders")
    snap_old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    snap_new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    return snapshot_diff(
        snap_old,
        snap_new,
        key_cols=["o_orderkey"],
        compare_cols=["status", "total"],
    )


# --------------------------------------------------------------------------
_INC_CUTOFF = "1998-01-01 00:00:00"


@register(
    "orders_incremental_agg_census",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS total_cents
    FROM orders GROUP BY o_custkey
    """,
    doc="Incremental aggregate maintenance census: per-customer "
    "(count, exact cents sum) computed as merge(state(base), "
    "state(delta)) across a date split — the materialized-view "
    "maintenance path (operators/incremental.py). The oracle is the "
    "full recompute; equality proves the merge law state(A)+state(B) "
    "= state(A∪B) on real data, for ANY split point (the result is "
    "split-invariant by construction). At 100 TB the stored state "
    "replaces the base scan: merging a day's delta costs "
    "|state|+|delta|, not |history|.",
)
def incremental_agg_census(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.incremental import agg_state, merge_states

    o = table(spark, sf, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    cutoff = F.lit(_INC_CUTOFF).cast("timestamp")
    base = o.filter(F.col("o_orderdate") < cutoff)
    delta = o.filter(F.col("o_orderdate") >= cutoff)
    states = [
        agg_state(
            part,
            key_cols=["o_custkey"],
            sum_cols={"total_cents": F.col("cents")},
            count_col="n_orders",
        )
        for part in (base, delta)
    ]
    return merge_states(
        states,
        key_cols=["o_custkey"],
        measure_cols=["n_orders", "total_cents"],
    )


# --------------------------------------------------------------------------
@register(
    "orders_cdc_apply_census",
    oracle="""
    SELECT status, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(floor(total * 100) AS BIGINT)) AS BIGINT)
            AS total_cents
    FROM (
        SELECT CASE WHEN o_orderkey % 11 = 0 THEN 'X'
                    ELSE o_orderstatus END AS status,
            o_totalprice AS total
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    GROUP BY status
    """,
    doc="CDC apply census — the roundtrip law as a gate row: the "
    "change feed derived by orders_snapshot_cdc_diff, APPLIED back "
    "onto the old snapshot (anti-join out deleted/changed keys, "
    "union the upserts), must reproduce the new snapshot exactly; "
    "the census is a per-status count + exact cents sum over the "
    "reconstruction, while the oracle computes it from the new "
    "snapshot DIRECTLY — any row the diff misclassified, dropped or "
    "duplicated breaks the hash. The diff is cached (change-volume-"
    "sized), so apply costs ONE diff computation + one key shuffle "
    "over |snapshot| + |changes| rows.",
)
def cdc_apply_census(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.cdc import snapshot_diff

    o = table(spark, sf, "orders")
    snap_old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    snap_new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    # The diff feeds two consumers (anti-join keys + upserts) whose
    # different column pruning defeats ReuseExchange — without a cache
    # the full outer join over both snapshots would execute twice in
    # one action. Caching is also the right production call: the diff
    # is CHANGE-volume-sized (the small side by construction), and
    # .cache() is lazy so plan-only tooling never materializes it.
    diff = snapshot_diff(
        snap_old, snap_new,
        key_cols=["o_orderkey"],
        compare_cols=["status", "total"],
    ).cache()
    upserts = diff.filter(F.col("op") != "D").select(
        "o_orderkey",
        F.col("new_status").alias("status"),
        F.col("new_total").alias("total"),
    )
    reconstructed = snap_old.join(
        diff.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(upserts)
    return reconstructed.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("CAST(sum(CAST(floor(total * 100) AS BIGINT)) AS BIGINT)")
        .alias("total_cents"),
    )


# --------------------------------------------------------------------------
@register(
    "orders_agg_retraction_census",
    oracle="""
    SELECT status, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(floor(total * 100) AS BIGINT)) AS BIGINT)
            AS total_cents
    FROM (
        SELECT CASE WHEN o_orderkey % 11 = 0 THEN 'X'
                    ELSE o_orderstatus END AS status,
            o_totalprice AS total
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    GROUP BY status
    """,
    doc="Retraction-aware aggregate maintenance: the per-status "
    "(count, exact cents) view is maintained through the CDC feed by "
    "STATE ARITHMETIC alone — deletes/updates retract the old row's "
    "contribution (negated measures), inserts/updates add the new "
    "one, one merge by key, zero-count groups dropped "
    "(operators/incremental.py::retract_merge). Oracle = direct "
    "aggregate of the new snapshot; the hash proves the retraction "
    "law on real data. Same oracle as orders_cdc_apply_census by "
    "design — THAT row reconstructs rows (cost ~ |snapshot|); this "
    "one never touches the snapshot after the diff: cost ~ |state| + "
    "|changes|, the only shape that works when the view is 10^4x "
    "smaller than the 100-TB base. min/max are refused upstream "
    "(not group-invertible), see the operator docstring.",
)
def agg_retraction_census(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.cdc import snapshot_diff
    from scio_db_spark.operators.incremental import (
        agg_state,
        retract_merge,
    )

    o = table(spark, sf, "orders")
    snap_old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    snap_new = o.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.col("o_totalprice").alias("total"),
    )
    cents = F.expr("CAST(floor(total * 100) AS BIGINT)")
    state = agg_state(
        snap_old.select("status", cents.alias("__c")),
        key_cols=["status"],
        sum_cols={"total_cents": F.col("__c")},
        count_col="n",
    )
    # diff feeds retraction AND addition branches — cache it
    # (change-volume-sized), same reasoning as cdc_apply_census
    diff = snapshot_diff(
        snap_old, snap_new,
        key_cols=["o_orderkey"],
        compare_cols=["status", "total"],
    ).cache()
    retr = agg_state(
        diff.filter(F.col("op").isin("D", "U")).select(
            F.col("old_status").alias("status"),
            F.expr("CAST(floor(old_total * 100) AS BIGINT)").alias("__c"),
        ),
        key_cols=["status"],
        sum_cols={"total_cents": F.col("__c")},
        count_col="n",
    )
    adds = agg_state(
        diff.filter(F.col("op").isin("I", "U")).select(
            F.col("new_status").alias("status"),
            F.expr("CAST(floor(new_total * 100) AS BIGINT)").alias("__c"),
        ),
        key_cols=["status"],
        sum_cols={"total_cents": F.col("__c")},
        count_col="n",
    )
    return retract_merge(
        state, retr, adds,
        key_cols=["status"],
        measure_cols=["total_cents"],
        count_col="n",
    )


# --------------------------------------------------------------------------
@register(
    "orders_delta_join_census",
    oracle=f"""
    SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
    doc="Incremental JOIN-view maintenance: the orders-x-customer "
    "join view is maintained under inserts on BOTH sides (a date "
    "batch of new orders AND a late-arriving customer batch) via the "
    "delta rule d(A JOIN B) = dA JOIN B_old UNION A_new JOIN dB "
    "(operators/incremental.py::delta_join; Gupta-Mumick IVM rules). "
    "V_old JOIN work is never redone: both maintenance joins carry a "
    "DELTA on one side, so maintaining the view costs "
    "|dA|x + |dB|-proportional work, not |A|x|B|. The census "
    "aggregates the incrementally-built view per nation; the oracle "
    "recomputes the full join directly — the hash proves the delta "
    "rule covers every pair exactly once (cross-delta pairs appear "
    "ONLY in the A_new JOIN dB term).",
)
def delta_join_census(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.incremental import delta_join

    cutoff = F.lit(_INC_CUTOFF).cast("timestamp")
    o = table(spark, sf, "orders").select(
        "o_custkey",
        "o_orderdate",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias(
            "cents"
        ),
    )
    c = table(spark, sf, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    a_old = o.filter(F.col("o_orderdate") < cutoff).drop("o_orderdate")
    d_a = o.filter(F.col("o_orderdate") >= cutoff).drop("o_orderdate")
    b_old = c.filter(F.col("o_custkey") % 3 != 0)
    d_b = c.filter(F.col("o_custkey") % 3 == 0)
    v_old = a_old.join(b_old, "o_custkey")
    v_new = v_old.unionByName(
        delta_join(a_old, d_a, b_old, d_b, on=["o_custkey"])
    )
    return v_new.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("total_cents"),
    )


# --------------------------------------------------------------------------
_ATTR_WINDOW_S = 3600


@register(
    "events_purchase_attribution",
    oracle=f"""
    WITH p AS (
        SELECT event_id, user_id, ts,
            CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id, ts, event_type, event_id FROM events
        WHERE event_type IN ('click', 'view')
    ),
    ranked AS (
        SELECT p.event_id, p.cents, t.event_type AS touch,
            row_number() OVER (PARTITION BY p.event_id
                               ORDER BY t.ts DESC, t.event_id DESC)
                AS rn
        FROM p JOIN t
          ON t.user_id = p.user_id AND t.ts <= p.ts
         AND epoch(p.ts) - epoch(t.ts) <= {_ATTR_WINDOW_S}.0
    ),
    att AS (SELECT event_id, cents, touch FROM ranked WHERE rn = 1),
    fused AS (
        SELECT coalesce(a.touch, 'none') AS touch, p.cents
        FROM p LEFT JOIN att a ON a.event_id = p.event_id
    )
    SELECT touch, CAST(count(*) AS BIGINT) AS n_purchases,
        CAST(sum(cents) AS BIGINT) AS cents
    FROM fused GROUP BY touch
    """,
    doc="Last-touch attribution: each purchase is credited to the "
    "user's LATEST click-or-view within a 1-hour window (ties broken "
    "by event id), 'none' when no touch qualifies — the standard "
    "marketing-attribution shape. Rides operators/asof.py with the "
    "new ``tolerance_s`` horizon (pandas merge_asof parity): ONE "
    "sort-merge fill per user, never a purchase x touch range join; "
    "the window bound is a post-fill projection, so the join cost is "
    "unchanged. Oracle = the quadratic ranked range join, affordable "
    "at gate SF; both engines compare fractional-second epochs as "
    "doubles, so the 3600 s boundary is bit-identical.",
)
def purchase_attribution(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.asof import asof_join

    e = _events(spark, sf)
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
    )
    t = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts").alias("touch_ts"),
        F.col("event_type").alias("touch"),
        F.col("event_id").alias("touch_id"),
    )
    att = asof_join(
        p,
        t,
        key="user_id",
        left_time="ts",
        right_time="touch_ts",
        payload_cols=["touch"],
        tie_col="touch_id",
        direction="backward",
        tolerance_s=_ATTR_WINDOW_S,
    )
    return att.groupBy(
        F.coalesce(F.col("touch"), F.lit("none")).alias("touch")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").alias("cents"),
    )


# --------------------------------------------------------------------------
# Holt linear-trend exponential smoothing over the per-type daily
# series — the forecasting member of the trend family (the OLS slope
# census fits ONE line to the whole window; Holt tracks a RECENCY-
# WEIGHTED level+trend, which is what operational alerting uses).
# Cross-engine determinism: both engines fold the SAME day-ordered
# list with the SAME IEEE-double expression tree (Spark `aggregate`,
# DuckDB `list_reduce`) — multiplication by the dyadic constants
# 0.25/0.75/0.5 is exact and fold order is the data order, so the raw
# doubles hash-match without any quantization policy. The fold runs
# AFTER the per-(type, day) count aggregation: the shuffle carries one
# double per day per type, and each type's series folds in a single
# task — days-per-series is the only growth axis, and it is bounded
# by the window, not the data volume.
@register(
    "events_type_holt_forecast",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
            CAST(count(*) AS DOUBLE) AS x
        FROM events GROUP BY event_type, day
    ),
    s AS (
        SELECT event_type, list(x ORDER BY day) AS xs
        FROM d GROUP BY event_type
    ),
    -- accumulator is the LIST [level, trend], not a struct: DuckDB
    -- 1.0's list_reduce computes struct fields sequentially over an
    -- ALIASED accumulator (a field expression reading acc.l after
    -- the output 'l' was computed sees the NEW value — measured, not
    -- guessed); list element construction has no such aliasing.
    f AS (
        SELECT event_type, len(xs) AS n_days,
            list_reduce(
                list_prepend(
                    [xs[1], 0.0::DOUBLE],
                    list_transform(xs[2:], v -> [v, 0.0::DOUBLE])),
                (acc, x) -> [
                    x[1] * 0.25::DOUBLE
                        + (acc[1] + acc[2]) * 0.75::DOUBLE,
                    ((x[1] * 0.25::DOUBLE
                      + (acc[1] + acc[2]) * 0.75::DOUBLE) - acc[1])
                        * 0.5::DOUBLE + acc[2] * 0.5::DOUBLE
                ]) AS h
        FROM s
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
        h[1] AS level, h[2] AS trend, h[1] + h[2] AS forecast_next
    FROM f ORDER BY event_type
    """,
    doc="Holt linear-trend smoothing (alpha=0.25, beta=0.5) over each "
    "event type's daily-count series; forecast_next = level + trend. "
    "Both engines fold the identical day-ordered list with the "
    "identical double expression tree (Spark aggregate / DuckDB "
    "list_reduce), dyadic constants keep every step exact-in-IEEE, "
    "so the gate hashes raw doubles. Per-series state is two doubles "
    "regardless of window length; the fold input is the per-day "
    "aggregate, never raw events.",
)
def events_type_holt_forecast(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    d = (
        e.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
    )
    s = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "x"))),
            lambda r: r["x"],
        ).alias("xs")
    )
    step_l = lambda acc, x: (  # noqa: E731
        x * F.lit(0.25) + (acc["l"] + acc["t"]) * F.lit(0.75)
    )
    holt = F.aggregate(
        F.expr("slice(xs, 2, greatest(size(xs) - 1, 0))"),
        F.struct(
            F.element_at("xs", 1).alias("l"), F.lit(0.0).alias("t")
        ),
        lambda acc, x: F.struct(
            step_l(acc, x).alias("l"),
            (
                (step_l(acc, x) - acc["l"]) * F.lit(0.5)
                + acc["t"] * F.lit(0.5)
            ).alias("t"),
        ),
    )
    return (
        s.select(
            "event_type",
            F.size("xs").cast("long").alias("n_days"),
            holt.alias("h"),
        )
        .select(
            "event_type",
            "n_days",
            F.col("h.l").alias("level"),
            F.col("h.t").alias("trend"),
            (F.col("h.l") + F.col("h.t")).alias("forecast_next"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# One-split changepoint (binary segmentation, first level): CUSUM
# (events_cusum_drift_census) answers WHETHER a level shift exists;
# this census answers WHERE — the split day t that maximizes the
# between-segment variance reduction for each type's daily series.
# For segment sums S1 (days <= t) and S2, sizes n1/n2, the reduction
# is (S1*n2 - S2*n1)^2 / (n1*n2*n): numerator and denominator are
# EXACT BIGINTs (daily counts; |S*n| < 2^40 here), so the only float
# is one division used as the argmax ORDER KEY — the identical
# expression tree in both engines, ties broken by earliest day.
@register(
    "events_type_changepoint",
    oracle="""
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS dy,
            CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY event_type, dy
    ),
    p AS (
        SELECT event_type, dy, x,
            sum(x) OVER w AS s1,
            CAST(row_number() OVER w AS BIGINT) AS n1,
            sum(x) OVER (PARTITION BY event_type) AS s,
            CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        FROM d
        WINDOW w AS (PARTITION BY event_type ORDER BY dy
                     ROWS UNBOUNDED PRECEDING)
    ),
    scored AS (
        SELECT event_type, dy, s1, n1, s - s1 AS s2, n - n1 AS n2, s, n,
            (CAST(s1 AS HUGEINT) * (n - n1) - CAST(s - s1 AS HUGEINT) * n1)
            * (CAST(s1 AS HUGEINT) * (n - n1) - CAST(s - s1 AS HUGEINT) * n1)
            AS num,
            n1 * (n - n1) * n AS den
        FROM p WHERE n1 < n
    ),
    best AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY event_type
                ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) DESC,
                         dy
            ) AS rn
            FROM scored
        ) WHERE rn = 1
    )
    SELECT event_type,
        CAST(dy AS VARCHAR) AS split_day,
        CAST(n1 AS BIGINT) AS n_pre,
        CAST(n2 AS BIGINT) AS n_post,
        CAST((s1 * 1000000) // n1 AS BIGINT) AS pre_mean_micro,
        CAST((s2 * 1000000) // n2 AS BIGINT) AS post_mean_micro,
        CAST(num AS VARCHAR) AS score_num,
        CAST(den AS BIGINT) AS score_den
    FROM best ORDER BY event_type
    """,
    doc="One-split changepoint census per event type (binary "
    "segmentation, first level): the split day maximizing the exact "
    "integer between-segment variance-reduction fraction "
    "(S1*n2 - S2*n1)^2 / (n1*n2*n), earliest-day tie-break. Companion "
    "to the CUSUM drift census (whether vs WHERE). Two windowed "
    "prefix passes over the per-day aggregate — the shuffle carries "
    "one row per (type, day); at 100 TB the series length is the "
    "window, not the data volume. score_num = (S1*n2 - S2*n1)^2 is "
    "computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) and "
    "reported as a decimal STRING: the square exceeds int64 once "
    "|S1*n2 - S2*n1| passes ~3.0e9 — a day-count series over ~1e7 "
    "events/day already crosses it, and non-ANSI Spark would WRAP "
    "silently while DuckDB errors loudly (round-9 ADVICE finding). "
    "Exact up to |num| < 1e38; the argmax order key is one double "
    "division over the exact wide integers, the identical expression "
    "tree in both engines; every other REPORTED column is exact "
    "int64 (floor-div micro-means, n/den terms).",
)
def events_type_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    e = table(spark, sf, "events")
    d = e.groupBy(
        "event_type", F.to_date("ts").alias("dy")
    ).agg(F.count(F.lit(1)).alias("x"))
    return changepoint_score(d)


def changepoint_score(d: DataFrame) -> DataFrame:
    """Scoring core over a per-day aggregate ``(event_type, dy, x)``
    — factored out of the registry query so the wide-integer path is
    directly testable with fabricated day counts large enough that
    (S1*n2 - S2*n1)^2 exceeds int64 (test_temporal_ops pins it
    against exact Python ints)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("dy")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("event_type")
    p = d.select(
        "event_type",
        "dy",
        F.sum("x").over(w).alias("s1"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("dy")
        ).cast("long").alias("n1"),
        F.sum("x").over(wt).alias("s"),
        F.count(F.lit(1)).over(wt).cast("long").alias("n"),
    )
    scored = (
        p.filter(F.col("n1") < F.col("n"))
        .withColumn("s2", F.col("s") - F.col("s1"))
        .withColumn("n2", F.col("n") - F.col("n1"))
        # DECIMAL(38,0) BEFORE the products: long arithmetic wraps
        # silently past 2^63 in non-ANSI Spark while DuckDB's HUGEINT
        # stays exact — the decimal tree keeps both engines identical
        # up to 1e38 (docstring bound).
        .withColumn(
            "diff",
            F.col("s1").cast("decimal(38,0)") * F.col("n2")
            - F.col("s2").cast("decimal(38,0)") * F.col("n1"),
        )
        .withColumn(
            "num", (F.col("diff") * F.col("diff")).cast("decimal(38,0)")
        )
        .withColumn("den", F.col("n1") * F.col("n2") * F.col("n"))
    )
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy(
            (
                F.col("num").cast("double") / F.col("den").cast("double")
            ).desc(),
            F.col("dy").asc(),
        )
    )
    best = scored.withColumn("rn", rn).filter(F.col("rn") == 1)
    return best.select(
        "event_type",
        F.col("dy").cast("string").alias("split_day"),
        F.col("n1").alias("n_pre"),
        F.col("n2").alias("n_post"),
        F.expr("(s1 * 1000000) DIV n1").alias("pre_mean_micro"),
        F.expr("(s2 * 1000000) DIV n2").alias("post_mean_micro"),
        # scale-0 decimal renders plainly ("123", no exponent) so the
        # string forms agree with DuckDB's HUGEINT::VARCHAR
        F.col("num").cast("string").alias("score_num"),
        F.col("den").alias("score_den"),
    ).orderBy("event_type")
