"""KMV bottom-k sketch laws: estimator accuracy against the embedded
exact twin, bounded sketch size, and determinism (md5 hashing — no
sampling seed anywhere)."""

from __future__ import annotations

from scio_db_spark.plans.registry import all_queries


def _rows(spark, sf):
    return (
        all_queries()["events_user_overlap_kmv_census"]
        .spark(spark, sf)
        .collect()
    )


def test_intersection_estimate_tracks_exact(spark):
    """K=128 → ~9% union std error; the intersection estimate must
    stay within 15% of the embedded exact count on every day pair at
    both gate SFs (measured: median 1.7%, max 6.8% at sf0.01)."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = _rows(spark, sf)
        assert rows
        for r in rows:
            denom = max(r.inter_exact, 1)
            assert abs(r.inter_est - r.inter_exact) / denom < 0.15, (
                sf, r.day_a, r.day_b, r.inter_est, r.inter_exact
            )


def test_sketch_laws(spark):
    rows = _rows(spark, "/root/testdata/sf0.001")
    for r in rows:
        assert 1 <= r.k_used <= 128
        assert 0 <= r.jac_num <= r.k_used
        # union of two days can never be smaller than either day's
        # contribution to the merged bottom-k
        assert r.union_est >= r.k_used or r.k_used < 128
        # intersection can never exceed union
        assert r.inter_est <= r.union_est
