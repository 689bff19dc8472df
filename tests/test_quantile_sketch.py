"""Bounded-error gates for the mergeable quantile sketches.

``events_latency_quantile_sketch`` (the 100 TB path of
``events_conversion_latency``) is since round 9 a DETERMINISTIC
log-grid histogram: each latency buckets to its top 7 significant
bits, counts sum, and the quantile is the first bucket floor whose
cumulative count reaches the exact census's rank. Determinism makes
the ESTIMATE oracle-checked bit-for-bit (CORRECTNESS gate); this
suite pins the two properties the oracle can't state:

- the grid estimate is the bucket FLOOR of the true order statistic:
  x*(1 - 2^-6) < est <= x;
- approx_percentile's Greenwald-Khanna summary — kept as the
  operator-level alternative (engine-native, tighter rank error) —
  lands within its guaranteed RANK distance of the exact order
  statistics, regardless of how many partitions feed the merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"
ACCURACY = 10000
GRID_BITS = 6


def _exact_lats(spark):
    from scio_db_spark.plans.mediation import _conversion_latency_us

    lat = _conversion_latency_us(spark, SF_DIR)
    vals = sorted(
        r.lat_us for r in lat.collect() if r.lat_us is not None
    )
    assert len(vals) > 50, "testdata too small to exercise the sketch"
    return lat, vals


def _rank_of(vals, x) -> int:
    """Number of values <= x (the rank GK bounds are stated over)."""
    import bisect

    return bisect.bisect_right(vals, x)


def _assert_rank_bound(vals, est, q):
    n = len(vals)
    target = q * n
    got = _rank_of(vals, est)
    # GK guarantee: |rank(est) - q*n| <= n/accuracy; +1 absorbs the
    # discrete rank-vs-real-target offset at tiny n.
    tol = n / ACCURACY + 1
    assert abs(got - target) <= tol, (
        f"sketch q={q}: est {est} has rank {got}, target {target:.1f}, "
        f"tolerance {tol:.1f} at n={n}"
    )


def test_grid_quantiles_bucket_floor_of_exact(spark):
    """The registered query's estimates are the bucket floors of the
    EXACT order statistics at the census ranks — relative error
    strictly below 2^-GRID_BITS, never over-reporting."""
    from scio_db_spark.plans.registry import all_queries

    _, vals = _exact_lats(spark)
    row = (
        all_queries()["events_latency_quantile_sketch"]
        .spark(spark, SF_DIR)
        .collect()[0]
    )
    n = len(vals)
    assert row.n_converted == n
    for est, rank in (
        (row.p50_us_est, (n - 1) // 2 + 1),
        (row.p90_us_est, (n - 1) * 9 // 10 + 1),
    ):
        x = vals[rank - 1]
        assert est <= x, (est, x)
        assert est > x * (1 - 2**-GRID_BITS), (est, x)


def test_grid_estimate_partition_invariant(spark):
    """Bucket counts are algebraic — the estimate cannot depend on
    the input partitioning (the mergeability claim, executed)."""
    from scio_db_spark.plans.mediation import _conversion_latency_us
    from scio_db_spark.plans.registry import all_queries

    base = (
        all_queries()["events_latency_quantile_sketch"]
        .spark(spark, SF_DIR)
        .collect()[0]
    )
    # same computation over an adversarial 1-partition funnel
    lat = _conversion_latency_us(spark, SF_DIR).repartition(1)
    lat.createOrReplaceTempView("__lat_1p")
    shift = f"greatest(length(bin(lat_us)) - 1 - {GRID_BITS}, 0)"
    got = spark.sql(
        f"""
        WITH b AS (
            SELECT CASE WHEN lat_us IS NULL THEN NULL ELSE
                shiftleft(shiftright(lat_us, {shift}), {shift}) END
                AS blo, count(*) AS cnt
            FROM __lat_1p GROUP BY 1
        ),
        c AS (
            SELECT blo, sum(cnt) OVER (ORDER BY blo) AS cum,
                sum(CASE WHEN blo IS NOT NULL THEN cnt END) OVER ()
                    AS n_conv
            FROM b WHERE blo IS NOT NULL
        )
        SELECT min(CASE WHEN cum >= (n_conv - 1) DIV 2 + 1
                        THEN blo END) AS p50,
               min(CASE WHEN cum >= (n_conv - 1) * 9 DIV 10 + 1
                        THEN blo END) AS p90
        FROM c
        """
    ).collect()[0]
    assert (got.p50, got.p90) == (base.p50_us_est, base.p90_us_est)


def test_gk_operator_quantiles_within_rank_bound(spark):
    """approx_percentile remains the engine-native operator path;
    its GK rank-error contract is pinned independently of the
    registered grid query."""
    lat, vals = _exact_lats(spark)
    got = (
        lat.agg(
            F.percentile_approx(
                "lat_us", F.array(F.lit(0.5), F.lit(0.9)), F.lit(ACCURACY)
            ).alias("q")
        )
        .collect()[0]
        .q
    )
    _assert_rank_bound(vals, got[0], 0.5)
    _assert_rank_bound(vals, got[1], 0.9)


@pytest.mark.parametrize("parts", [1, 32])
def test_gk_bound_holds_across_partitionings(spark, parts):
    """The mergeable-composition leg: with 32 input partitions the
    final value is the MERGE of 32 independent partial sketches; with
    1 it is a single summary. Both must satisfy the same rank bound —
    the merge cannot degrade the guarantee (KLL/GK mergeability)."""
    lat, vals = _exact_lats(spark)
    got = (
        lat.repartition(parts)
        .agg(
            F.percentile_approx(
                "lat_us", F.array(F.lit(0.5), F.lit(0.9)), F.lit(ACCURACY)
            ).alias("q")
        )
        .collect()[0]
        .q
    )
    _assert_rank_bound(vals, got[0], 0.5)
    _assert_rank_bound(vals, got[1], 0.9)
