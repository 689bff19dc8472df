"""Additional TPC-H join/subquery shapes (free relational surface).

The reference (albertols/scio-db) has no relational optimizer surface
of its own (SURVEY.md §2.7 note) — these queries exercise the Spark
planner shapes a user of the engine gets for free, each chosen for a
distinct physical pattern the 100 TB design cares about:

- q07: fact-fact join with dims applied twice (supplier/customer
  nation) and a disjunctive pair filter — dims broadcast once each.
- q13: outer join + two-level aggregation (count distribution).
- q15: reused subplan + scalar-subquery max (decimal-exact equality).
- q17: correlated per-group average via self-aggregation + join-back
  (no per-row subquery execution; one shuffle on the part key).
- q18: HAVING-gated semi-join into a wide top-k.
- q19: disjunctive multi-column predicate — stays inside one join's
  residual condition, no union-of-scans.
- q22: anti join against a date-gated order set + a scalar average
  threshold (exact decimal cross-multiply, no double boundary).

Float determinism follows plans/relational.py: exact decimal sums,
double conversion only via string round-trip (`_d2d`), and avg-style
thresholds compared as `value * count (cmp) sum` so no division ever
happens at a comparison boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from scio_db_spark.plans.catalog import table
from scio_db_spark.plans.registry import register
from scio_db_spark.plans.relational import _d2d, _d2d_sql, _dec


# --------------------------------------------------------------------------
@register(
    "q07_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
        {_d2d_sql(
            "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))"
        )} AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
            year(l.l_shipdate) AS l_year,
            l.l_extendedprice, l.l_discount
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: lineitem-orders fact join with nation dims "
    "joined twice under a disjunctive pair filter; both nation copies "
    "broadcast, so the only shuffle is the orderkey join + final agg.",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    s = table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    c = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    l = table(spark, sf, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount",
        "l_shipdate",
    )
    n1 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    joined = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        # supplier scales with SF (SF x 10k rows) — no forced broadcast
        # (threshold/AQE decide); nation is a fixed 25-row dim — hint it.
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(_d2d(F.sum(revenue)).alias("revenue"))


# --------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: outer join with a join-side (not WHERE-side) "
    "predicate, then a two-level aggregation — customers with zero "
    "matching orders must survive as c_count=0.",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select("c_custkey")
    o = table(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
_Q15_START, _Q15_END = "1997-01-01", "1997-04-01"


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
            sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                AS total_rev
        FROM lineitem
        WHERE l_shipdate >= DATE '{_Q15_START}'
          AND l_shipdate < DATE '{_Q15_END}'
        GROUP BY l_suppkey
    )
    , m AS (
        SELECT supplier_no, total_rev,
            max(total_rev) OVER () AS max_rev
        FROM revenue
    )
    SELECT s.s_suppkey, s.s_name,
        {_d2d_sql("m.total_rev")} AS total_revenue
    FROM supplier s JOIN m ON s.s_suppkey = m.supplier_no
    WHERE m.total_rev = m.max_rev
    """,
    doc="TPC-H Q15 shape: aggregated subplan + scalar max, the max "
    "folded into an unpartitioned window over the REDUCED "
    "per-supplier revenue frame (one lineitem pass; the "
    "scalar-subquery form planned the revenue subtree twice — 0 "
    "ReusedExchange). The max comparison happens on exact decimals "
    "(ties all surface); double conversion only on output.",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q15_START).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q15_END).cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,6)"
            )
        ).alias("total_rev")
    )
    # Scalar max as an unpartitioned window over the reduced
    # per-supplier frame: one lineitem pass (the agg + broadcast-join
    # form recomputed `rev` twice), ~|suppliers| rows crossing the
    # whitelisted SinglePartition exchange.
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    top = rev.withColumn("max_rev", F.max("total_rev").over(w)).filter(
        F.col("total_rev") == F.col("max_rev")
    )
    s = table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        # After the max filter `top` is ~1 row; AQE broadcasts it.
        top.join(s, top.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", _d2d(F.col("total_rev")).alias("total_revenue"))
    )


# --------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH pl AS (
        SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
    ), flagged AS (
        SELECT l_quantity, l_extendedprice,
            sum(CAST(l_quantity AS DECIMAL(18,2)))
                OVER (PARTITION BY l_partkey) AS sum_qty,
            count(*) OVER (PARTITION BY l_partkey) AS cnt
        FROM pl
    )
    SELECT coalesce({_d2d_sql(
        "sum(CAST(l_extendedprice AS DECIMAL(18,2)))"
    )} / 7.0, 0.0) AS avg_yearly,
        count(*) AS n_lines
    FROM flagged
    WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sum_qty
    """,
    doc="TPC-H Q17 shape: correlated per-part average decorrelated "
    "into WINDOW aggregates over the brand-pruned line set — one "
    "shuffle on partkey, one fact pass (the aggregate + join-back "
    "form planned the pruned join subtree twice: 0 ReusedExchange). "
    "The `qty < 0.2*avg` boundary is evaluated as `qty*5*cnt < sum` "
    "in exact decimals — no double division at the comparison, so "
    "Spark and DuckDB agree bit-for-bit.",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    p = table(spark, sf, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    l = table(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    # Brand filter first: only ~1/25 of parts survive, so downstream
    # aggregation runs on the pruned line set, not all of lineitem.
    pl = l.join(p, l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    small = pl.select(
        "l_quantity",
        "l_extendedprice",
        F.sum(_dec("l_quantity")).over(w).alias("sum_qty"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    ).filter(_dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
    return small.agg(
        F.coalesce(
            _d2d(F.sum(_dec("l_extendedprice"))) / F.lit(7.0), F.lit(0.0)
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# --------------------------------------------------------------------------
_Q18_QTY = 300


@register(
    "q18_large_volume_customers",
    headline=True,
    oracle=f"""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
        o.o_totalprice,
        {_d2d_sql("sum(CAST(l.l_quantity AS DECIMAL(18,2)))")} AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {_Q18_QTY}
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
        o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: HAVING-gated aggregate feeding a semi-join "
    "into a wide join + top-k. ONE lineitem aggregation serves both "
    "the gate and the output sum (the SQL's second per-order sum over "
    "qualifying rows equals the gate's sum, so the plan scans lineitem "
    "once); the tiny qualifying set then joins orders and customer.",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > _Q18_QTY)
        .select("l_orderkey", _d2d(F.col("sq")).alias("sum_qty"))
    )
    o = table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = table(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT coalesce({_d2d_sql(
        "sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)))"
    )}, 0.0) AS revenue,
        count(*) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: disjunction of multi-column conjunct groups "
    "spanning both join sides — one join with a residual OR filter "
    "(no union of three scans); the per-side prefilters "
    "(brand IN .., size <= 15, quantity <= 30) are implied and pushed.",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    # Implied single-side prefilters, pushed to the scans so the join
    # only sees candidate rows (Catalyst cannot infer these from an OR
    # across both sides).
    p = table(spark, sf, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.coalesce(_d2d(F.sum(revenue)), F.lit(0.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
_Q22_CUTOFF = "2001-01-01"


@register(
    "q22_dormant_rich_customers",
    oracle=f"""
    WITH stats AS (
        SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS n
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, count(*) AS numcust,
        {_d2d_sql("sum(CAST(c.c_acctbal AS DECIMAL(18,2)))")} AS totacctbal
    FROM customer c, stats
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * stats.n > stats.s
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= DATE '{_Q22_CUTOFF}')
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape: scalar average threshold + anti join. "
    "`acctbal > avg(positive acctbals)` is evaluated as "
    "`acctbal * n > sum` in exact decimals (no double division at the "
    "boundary); the dormancy anti-join probes only date-gated orders. "
    "(The synthetic data has no order-less customers, so dormancy = "
    f"no orders after {_Q22_CUTOFF} replaces Q22's no-orders test.)",
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    # DELIBERATELY the two-scan scalar form, NOT the window fold used
    # by q11/q15/q17: those fold totals over REDUCED (post-aggregate)
    # frames, but here the window would have to run over the RAW
    # customer frame — a data-sized SinglePartition crossing, worse at
    # scale than a second map-side scan feeding a one-row stats frame.
    stats = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(_dec("c_acctbal")).alias("s"), F.count(F.lit(1)).alias("n")
    )
    recent = table(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    rich = c.join(F.broadcast(stats)).filter(
        _dec("c_acctbal") * F.col("n") > F.col("s")
    )
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        _d2d(F.sum(_dec("c_acctbal"))).alias("totacctbal"),
    )


# --------------------------------------------------------------------------
@register(
    "global_rank_customers",
    headline=True,
    oracle=f"""
    SELECT c_custkey, revenue,
        row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rank
    FROM (
        SELECT o_custkey AS c_custkey,
            {_d2d_sql("sum(CAST(o_totalprice AS DECIMAL(18,2)))")}
                AS revenue
        FROM orders GROUP BY o_custkey
    )
    """,
    doc="Global total-order rank of every customer by revenue via "
    "operators/rank.py::global_rank — range partitioning + local "
    "row_number + broadcast prefix offsets, so NO full-data "
    "single-partition exchange (the naive global window's plan). "
    "Oracle = the naive form, which DuckDB can afford single-node.",
)
def global_rank_customers(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.operators.rank import global_rank

    o = table(spark, sf, "orders")
    rev = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        _d2d(F.sum(_dec("o_totalprice"))).alias("revenue")
    )
    ranked = global_rank(
        rev, [F.desc("revenue"), F.asc("c_custkey")], rank_col="rank"
    )
    return ranked.select("c_custkey", "revenue", "rank")


# --------------------------------------------------------------------------
_SQL_SURFACE = """
    SELECT n.n_name,
        count(*) AS n_orders,
        CAST(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS STRING)
             AS DOUBLE) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY n.n_name
"""


@register(
    "sql_surface_nation_revenue",
    oracle=f"""
    SELECT n.n_name,
        count(*) AS n_orders,
        {_d2d_sql("sum(CAST(o.o_totalprice AS DECIMAL(18,2)))")} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'O'
    GROUP BY n.n_name
    """,
    doc="Raw ANSI-SQL surface: the engine registers the catalog as "
    "temp views and executes spark.sql() text directly — same Catalyst "
    "plan (pushdown, broadcast dims) as the DataFrame form, proving "
    "users can bring plain SQL to this engine.",
)
def sql_surface_nation_revenue(spark: SparkSession, sf: str) -> DataFrame:
    from scio_db_spark.plans.catalog import register_temp_views

    register_temp_views(spark, sf)
    return spark.sql(_SQL_SURFACE)


# --------------------------------------------------------------------------
@register(
    "q08_market_share",
    oracle=f"""
    SELECT o_year,
        {_d2d_sql(
            "sum(CASE WHEN nation = 'NATION_1' THEN volume "
            "ELSE CAST(0 AS DECIMAL(30,6)) END)"
        )} / {_d2d_sql("sum(volume)")} AS mkt_share
    FROM (
        SELECT year(o.o_orderdate) AS o_year,
            CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(30,6)) AS volume,
            n2.n_name AS nation
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
    )
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (adapted to the trimmed schema — no partsupp): "
    "seven-way star join, supplier nation share of one region's "
    "STANDARD-part revenue per year. Dims stay under the broadcast "
    "threshold and AQE decides; no forced hints on SF-scaling tables. "
    "The share divides two exact decimal sums only after the "
    "string→double round-trip, so both sides divide identical doubles.",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    s = table(spark, sf, "supplier")
    p = table(spark, sf, "part").filter(F.col("p_type") == "STANDARD")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    joined = (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n.alias("n1"), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(r, F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n.alias("n2"), F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.col("n2.n_name").alias("nation"),
        )
    )
    zero = F.lit(0).cast("decimal(30,6)")
    return joined.groupBy("o_year").agg(
        (
            _d2d(F.sum(
                F.when(F.col("nation") == "NATION_1", F.col("volume"))
                .otherwise(zero)
            ))
            / _d2d(F.sum("volume"))
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
        {_d2d_sql(
            "sum(CAST(l.l_extendedprice * (1 - l.l_discount)"
            " AS DECIMAL(30,6)))"
        )} AS revenue,
        c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue ranking — date-pruned "
    "fact-fact join, wide grouping keys, top-20 with a deterministic "
    "custkey tiebreak. The quarter filter reaches the orders scan "
    "(PushedFilters) and prunes before the join.",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-04-01")
    )
    l = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    return (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_d2d(F.sum(rev)).alias("revenue"))
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal",
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT year(l.l_shipdate) * 100 + month(l.l_shipdate) AS ym,
        100.0 * {_d2d_sql(
            "sum(CASE WHEN p.p_type = 'PROMO' THEN "
            "CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,6)) "
            "ELSE CAST(0 AS DECIMAL(30,6)) END)"
        )} / {_d2d_sql(
            "sum(CAST(l.l_extendedprice * (1 - l.l_discount)"
            " AS DECIMAL(30,6)))"
        )} AS promo_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
    doc="TPC-H Q14 shape: promo revenue share per month — one "
    "fact-dim equi-join under a pushed year filter, conditional "
    "aggregation, division after exact-decimal sums round-trip to "
    "identical doubles.",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    p = table(spark, sf, "part")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    zero = F.lit(0).cast("decimal(30,6)")
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ym"),
            vol.alias("volume"),
            F.col("p_type"),
        )
        .groupBy("ym")
        .agg(
            (
                F.lit(100.0)
                * _d2d(F.sum(
                    F.when(F.col("p_type") == "PROMO", F.col("volume"))
                    .otherwise(zero)
                ))
                / _d2d(F.sum("volume"))
            ).alias("promo_pct")
        )
    )


# --------------------------------------------------------------------------
_SQL_GROUPING_SETS = """
    SELECT o_orderstatus, o_orderpriority,
        CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
             AS BIGINT) AS gid,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register(
    "orders_grouping_sets_census",
    oracle=_SQL_GROUPING_SETS,
    doc="GROUPING SETS surface: three aggregation grains in ONE scan "
    "(per status, per priority, grand total), distinguished by "
    "grouping() flags — the ad-hoc-grain companion to "
    "cube_order_status_priority, executed as raw spark.sql() text "
    "over the registered catalog views. Spark plans one Expand + one "
    "hash aggregate: the fact table is read once for all grains, the "
    "property dashboards need at 100 TB (three separate GROUP BYs "
    "would triple the scan).",
)
def orders_grouping_sets_census(
    spark: SparkSession, sf: str
) -> DataFrame:
    from scio_db_spark.plans.catalog import register_temp_views

    register_temp_views(spark, sf)
    return spark.sql(_SQL_GROUPING_SETS)
