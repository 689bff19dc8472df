"""Bounded-error gate for the mergeable quantile sketch twin.

``events_latency_quantile_sketch`` is the 100 TB path of
``events_conversion_latency``: approx_percentile's Greenwald-Khanna
summary guarantees rank error <= n/accuracy, and its per-partition
partial sketches merge associatively — so the plan's one global
exchange carries fixed-size sketches, not rows. No cross-engine
oracle exists for an approximate sketch (the HLL posture), so this
suite pins the contract instead:

- the sketch's p50/p90 land within the guaranteed RANK distance of
  the exact order statistics;
- the bound holds regardless of how many partitions the input is
  split into (the merge path — partials from 1 vs 32 partitions).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"
ACCURACY = 10000


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


def test_sketch_quantiles_within_rank_bound(spark):
    from scio_db_spark.plans.registry import all_queries

    _, vals = _exact_lats(spark)
    row = (
        all_queries()["events_latency_quantile_sketch"]
        .spark(spark, SF_DIR)
        .collect()[0]
    )
    assert row.n_converted == len(vals)
    _assert_rank_bound(vals, row.p50_us_est, 0.5)
    _assert_rank_bound(vals, row.p90_us_est, 0.9)


@pytest.mark.parametrize("parts", [1, 32])
def test_sketch_bound_holds_across_partitionings(spark, parts):
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
