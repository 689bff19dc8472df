"""TPC-H shapes q02/q09/q11/q12/q16/q20/q21, adapted to the test schema.

Completes the TPC-H family (relational.py + tpch_more.py cover q01,
q03-q08, q10, q13-q15, q17-q19, q22). The test data has no ``partsupp``
table and ``lineitem`` lacks commit/receipt dates and shipmode, so each
query keeps its canonical PHYSICAL shape (the planner pattern the
100 TB design cares about) with semantics adapted to available columns:

- q02: per-group min + join-back (correlated min-cost subquery) —
  window-min over the part key after a (part, supplier) pre-aggregate;
  supply cost proxied by min lineitem price.
- q09: multi-dim star join + two-key aggregate (profit by nation/year);
  supply cost proxied as 10% of part retail price.
- q11: fraction-of-total HAVING (scalar subquery threshold) — exact
  int64 basis-point arithmetic on both sides, never a float compare.
- q12: fact-fact join + conditional aggregation; "late" derived from
  shipdate vs orderdate + 60 days instead of commit/receipt dates.
- q16: distinct-count per part attribute with a NOT-IN supplier
  exclusion (anti join).
- q20: nested double-aggregate semi-join chain (suppliers holding an
  outsized share of a part's shipped quantity).
- q21: multi-supplier order forensics — two grouping levels over the
  same fact, exists/not-exists folded into conditional window counts.

Reference parity: the reference engine (albertols/scio-db) exposes no
relational optimizer surface of its own (SURVEY.md §2.7); these shapes
are the free Spark surface its users get on migration, verified
against DuckDB.

Float determinism follows plans/relational.py: exact decimal sums or
scaled-int64 cents/basis-points on the hot path, `_d2d` string
round-trip at the double boundary, avg-style thresholds compared as
cross-multiplied integers so no division happens before a comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scio_db_spark.plans.catalog import table
from scio_db_spark.plans.registry import register
from scio_db_spark.plans.relational import _d2d, _d2d_sql, _scaled_to_double


# ---------------------------------------------------------------- helpers
def _bp(price_col: str, disc_col: str) -> Column:
    """Exact int64 basis-point revenue: price_cents * (100 - disc_pct).

    Monetary inputs sit on a 2-decimal grid (verified in
    BENCH_LOCAL_r04_q01.txt: max drift 1e-9, no rounding ties), so
    ``round(x*100)`` recovers exact cents and the PRODUCT is exact
    long arithmetic — the same q01 hot path. Callers must accumulate
    the products in decimal(38,0) (``F.sum(bp.cast("decimal(38,0)"))``):
    a long SUM overflows ~2^63 within reach of real scale factors,
    where Spark aborts under ANSI while DuckDB silently widens to
    HUGEINT. Measured cost of the wider sum buffer on q01: 0.80s vs
    0.59s at sf0.1 — still 0.6x of the full-decimal pipeline, and
    overflow-correct at every SF.
    """
    cents = F.round(F.col(price_col) * 100).cast("bigint")
    disc = F.round(F.col(disc_col) * 100).cast("bigint")
    return cents * (F.lit(100) - disc)


def _bp_sql(price_col: str, disc_col: str) -> str:
    return (
        f"CAST(round({price_col}*100) AS BIGINT)"
        f" * (100 - CAST(round({disc_col}*100) AS BIGINT))"
    )


def _bp_to_double_sql(sum_expr: str) -> str:
    """DuckDB twin of ``_scaled_to_double(s, 4)``: exact bigint
    basis-point sum → double via integer div/mod + string build (DuckDB
    decimal division returns DOUBLE, which would double-round)."""
    return (
        "CAST(concat("
        f"CAST({sum_expr} // 10000 AS VARCHAR), '.', "
        f"lpad(CAST({sum_expr} % 10000 AS VARCHAR), 4, '0')"
        ") AS DOUBLE)"
    )


# --------------------------------------------------------------------------
@register(
    "q02_min_cost_supplier",
    oracle="""
    WITH cost AS (
        SELECT l_partkey, l_suppkey,
            min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    scoped AS (
        SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand,
            c.cost,
            min(c.cost) OVER (PARTITION BY p.p_partkey) AS min_cost
        FROM cost c
        JOIN part p ON p.p_partkey = c.l_partkey
         AND p.p_size BETWEEN 10 AND 20 AND p.p_type = 'SMALL'
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
         AND r.r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
        CAST(CAST(cost AS VARCHAR) AS DOUBLE) AS supply_cost
    FROM scoped WHERE cost = min_cost
    """,
    doc="TPC-H Q2 shape: correlated min-cost-supplier subquery as a "
    "window-min over the part key. The (part, supplier) pre-aggregate "
    "carries the one data-sized shuffle; the window re-shuffles only "
    "the ~|parts| aggregated frame; nation/region are fixed-size dims "
    "(broadcast). Supply cost proxied by min lineitem price (no "
    "partsupp table). Min over exact decimal(18,2) — tie rows on both "
    "engines surface identically.",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    p = (
        table(spark, sf, "part")
        .filter(
            F.col("p_size").between(10, 20) & (F.col("p_type") == "SMALL")
        )
        .select("p_partkey", "p_brand")
    )
    s = table(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = table(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = (
        table(spark, sf, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    cost = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("cost")
    )
    # part filter prunes before the window; supplier scales with SF so
    # the planner (size threshold / AQE) decides its join strategy,
    # nation+region are fixed 25/5-row dims — broadcast hinted.
    scoped = (
        cost.join(p, cost.l_partkey == p.p_partkey)
        .join(s, cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        scoped.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            _d2d(F.col("cost")).alias("supply_cost"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "q09_product_profit",
    headline=True,  # round-4 star-join representative in the bench set
    oracle=f"""
    SELECT n_name, o_year,
        {_d2d_sql(
            "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))"
            " - CAST(0.1 * p_retailprice * l_quantity AS DECIMAL(30,6)))"
        )} AS sum_profit
    FROM (
        SELECT n.n_name, year(l.l_shipdate) AS o_year,
            l.l_extendedprice, l.l_discount, l.l_quantity, p.p_retailprice
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
         AND p.p_name LIKE '%widget%'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
    )
    GROUP BY n_name, o_year
    """,
    doc="TPC-H Q9 shape: star join (part/supplier/nation dims on the "
    "lineitem fact) + two-key profit aggregate. Supply cost proxied as "
    "10% of part retail price (no partsupp). The p_name LIKE filter "
    "pushes into the part scan before its join; the decimal "
    "subtraction keeps both products exact, so the grouped sum is "
    "order-insensitive. One fact shuffle (final agg) at scale.",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_quantity", "l_shipdate",
    )
    p = (
        table(spark, sf, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf, "nation").select("n_nationkey", "n_name")
    # Identical left-associated multiply chains on both engines, each
    # cast to decimal before the (exact) subtraction and sum.
    profit = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
            "decimal(30,6)"
        )
        - (F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")).cast(
            "decimal(30,6)"
        )
    )
    joined = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy(
        "n_name", F.year("l_shipdate").alias("o_year")
    ).agg(_d2d(F.sum(profit)).alias("sum_profit"))


# --------------------------------------------------------------------------
_Q11_NATION = "NATION_7"
_Q11_MULT = 1500  # keep parts with value > total/1500


@register(
    "q11_important_stock",
    oracle=f"""
    WITH scoped AS (
        SELECT l.l_partkey, {_bp_sql("l.l_extendedprice", "l.l_discount")}
            AS bp
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
         AND n.n_name = '{_Q11_NATION}'
    ),
    per_part AS (
        SELECT l_partkey, sum(bp) AS value_bp FROM scoped
        GROUP BY l_partkey
    ),
    with_total AS (
        SELECT l_partkey, value_bp,
            sum(value_bp) OVER () AS total_bp
        FROM per_part
    )
    SELECT l_partkey AS partkey,
        {_bp_to_double_sql("value_bp")} AS part_value
    FROM with_total
    WHERE value_bp * {_Q11_MULT} > total_bp
    """,
    doc="TPC-H Q11 shape: fraction-of-total HAVING — per-part value "
    "vs a global total, both exact int64 basis-point sums, threshold "
    "compared as an integer cross-multiply (never a float or a "
    "division). The total is an unpartitioned window over the "
    "REDUCED per-part frame (one fact pass; a scalar-subquery cross "
    "join planned the scoped subtree twice); the per-part aggregate "
    "carries the one data-sized shuffle. Stock value proxied by "
    "shipped revenue per part from one nation's suppliers (no "
    "partsupp).",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        table(spark, sf, "nation")
        .filter(F.col("n_name") == _Q11_NATION)
        .select("n_nationkey")
    )
    scoped = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_partkey", _bp("l_extendedprice", "l_discount").alias("bp"))
    )
    per_part = scoped.groupBy("l_partkey").agg(
        # decimal(38,0) accumulation of the exact int64 products —
        # see _bp: a long sum overflows within real-SF reach.
        F.sum(F.col("bp").cast("decimal(38,0)")).alias("value_bp")
    )
    # Global total as an unpartitioned window over the REDUCED
    # per-part frame (one fact pass; the scalar-subquery cross join
    # planned `scoped` twice — 0 ReusedExchange). The SinglePartition
    # crossing carries only ~|parts| pre-aggregated rows (whitelisted
    # in tools/explain_audit.py).
    total = F.sum("value_bp").over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return (
        per_part.withColumn("total_bp", total)
        .filter(F.col("value_bp") * _Q11_MULT > F.col("total_bp"))
        .select(
            F.col("l_partkey").alias("partkey"),
            _scaled_to_double(F.col("value_bp"), 4).alias("part_value"),
        )
    )


# --------------------------------------------------------------------------
_Q12_HIGH = ("1-URGENT", "2-HIGH")


@register(
    "q12_late_lines_by_status",
    oracle=f"""
    SELECT l.l_linestatus,
        CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                 THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape: fact-fact equi-join + conditional "
    "aggregation over a cross-table predicate. 'Late' derived as "
    "shipdate > orderdate + 60 days (no commit/receipt dates); "
    "linestatus stands in for shipmode. The join carries the only "
    "shuffle (AQE picks sort-merge vs shuffled-hash at scale); counts "
    "are integers, so no float hazard anywhere.",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    o = table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin(*_Q12_HIGH)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
        count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
     AND p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
     AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
    WHERE l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier count per part attribute "
    "with a NOT-IN supplier exclusion. The exclusion list (suppliers "
    "with negative balance — the 'customer complaints' proxy) is a "
    "broadcast anti join; part predicates push into its scan; the "
    "distinct aggregate expands to the standard two-phase plan "
    "(partial distinct on (attrs, suppkey), then count). Supplier "
    "relation derived through lineitem (no partsupp).",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        table(spark, sf, "part")
        .filter(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
_Q20_NATION = "NATION_3"


@register(
    "q20_excess_share_suppliers",
    oracle=f"""
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
            sum(CAST(round(l_quantity) AS BIGINT)) AS sq
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
        SELECT l_suppkey, sq,
            sum(sq) OVER (PARTITION BY l_partkey) AS part_total
        FROM shipped
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM tot t
    JOIN supplier s ON s.s_suppkey = t.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
     AND n.n_name = '{_Q20_NATION}'
    WHERE 2 * t.sq > t.part_total
    """,
    doc="TPC-H Q20 shape: fraction-of-group semi-join — suppliers in "
    "one nation holding an outsized (>50%) share of a red-part's "
    "1997 shipped quantity. The per-part total is a window sum over "
    "the SAME (part, supplier) pre-aggregate (one fact pass; a "
    "re-aggregate + join-back would plan the subtree twice). "
    "Quantities are integral (verified), so exact bigint sums and an "
    "integer cross-multiply threshold. DISTINCT stands in for the "
    "EXISTS semi join.",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    ).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = (
        table(spark, sf, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    s = table(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = (
        table(spark, sf, "nation")
        .filter(F.col("n_name") == _Q20_NATION)
        .select("n_nationkey")
    )
    shipped = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.round("l_quantity").cast("bigint")).alias("sq"))
    )
    # Per-part total as a window over the SAME pre-aggregate — the
    # re-aggregate + join-back form planned the fact subtree twice
    # (0 ReusedExchange); the window re-shuffles only the reduced
    # (part, supplier) frame on the part key.
    w = Window.partitionBy("l_partkey")
    excess = shipped.withColumn(
        "part_total", F.sum("sq").over(w)
    ).filter(2 * F.col("sq") > F.col("part_total"))
    return (
        excess.join(s, excess.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


# --------------------------------------------------------------------------
_Q21_NATION = "NATION_3"
_Q21_LIMIT = 25


@register(
    "q21_suppliers_kept_waiting",
    headline=True,  # round-4 multi-level-aggregate representative
    oracle=f"""
    WITH per_supp AS (
        SELECT l.l_orderkey, l.l_suppkey,
            CASE WHEN max(l.l_shipdate) > any_value(o.o_orderdate)
                      + INTERVAL 45 DAY
                 THEN 1 ELSE 0 END AS late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
         AND o.o_orderstatus = 'F'
        GROUP BY l.l_orderkey, l.l_suppkey
    ),
    flagged AS (
        SELECT l_suppkey, late,
            count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
            sum(late) OVER (PARTITION BY l_orderkey) AS n_late
        FROM per_supp
    )
    SELECT s.s_name, count(*) AS numwait
    FROM flagged f
    JOIN supplier s ON s.s_suppkey = f.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
     AND n.n_name = '{_Q21_NATION}'
    WHERE f.late = 1 AND f.n_supp > 1 AND f.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT {_Q21_LIMIT}
    """,
    doc="TPC-H Q21 shape: suppliers who alone kept a multi-supplier "
    "order waiting — the exists/not-exists pair folded into window "
    "counts over ONE (order, supplier) lateness pre-aggregate. The "
    "earlier re-aggregate + join-back form planned the fact-join "
    "subtree TWICE (0 ReusedExchange — canonicalization missed the "
    "identical aggregates); the window form re-shuffles only the "
    "reduced per-(order,supplier) frame on the order key. 'Late' = "
    "max shipdate > orderdate + 45 days (no commit/receipt dates). "
    "Deterministic top-k: ties broken by unique s_name.",
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        table(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    s = table(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = (
        table(spark, sf, "nation")
        .filter(F.col("n_name") == _Q21_NATION)
        .select("n_nationkey")
    )
    per_supp = (
        # ONE exchange serves both the (orderkey, suppkey) aggregate
        # and the orderkey window below (guide §2.4: hash(l_orderkey)
        # already clusters every (l_orderkey, l_suppkey) group, and the
        # window's requirement is the same key) — the ENSURE_
        # REQUIREMENTS form paid a second data-sized Exchange between
        # them. Cost: the repartition ships raw join rows instead of
        # the pre-aggregate, but (orderkey, suppkey) is ~unique in
        # lineitem (~1.07 rows/group at every SF), so map-side partial
        # aggregation was saving ~nothing. Measured at sf0.1:
        # 3 Exchange -> 2, 1.87 s -> 1.16 s, rows identical.
        l.join(o, l.l_orderkey == o.o_orderkey)
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.when(
                F.max("l_shipdate")
                > F.any_value("o_orderdate") + F.expr("INTERVAL 45 DAYS"),
                1,
            )
            .otherwise(0)
            .alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per_supp.select(
        "l_suppkey",
        "late",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("late").over(w).alias("n_late"),
    )
    waiting = (
        flagged.filter(
            (F.col("late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .join(s, flagged.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(_Q21_LIMIT)
    )
