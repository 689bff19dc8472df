"""Library-op oracle queries (plans/libops.py) + committed model file."""

from __future__ import annotations

import json
import math
import os

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _models():
    with open(
        os.path.join(
            _REPO_ROOT, "scio_db_spark", "resources", "vector_models.json"
        )
    ) as f:
        return json.load(f)


def test_committed_kmeans_model_shape():
    km = _models()["kmeans_k16"]
    cents = km["centroids"]
    assert len(cents) == 16
    assert all(len(c) == 64 for c in cents)
    # fit normalizes centroids to unit L2 (cosine k-means)
    for c in cents:
        n = math.sqrt(sum(x * x for x in c))
        assert abs(n - 1.0) < 1e-9
    # distinct centroids (a degenerate fit would collapse clusters)
    assert len({tuple(c) for c in cents}) == 16


def test_committed_pca_model_shape():
    p = _models()["pca_2"]
    assert len(p["mean"]) == 64
    comps = p["components"]
    assert len(comps) == 2 and all(len(c) == 64 for c in comps)
    for c in comps:
        n = math.sqrt(sum(x * x for x in c))
        assert abs(n - 1.0) < 1e-9
    dot = sum(a * b for a, b in zip(comps[0], comps[1]))
    assert abs(dot) < 1e-9  # orthogonal
    ev = p["explained_variance"]
    assert ev[0] >= ev[1] > 0


def test_quantize_roundtrip_error_bound(spark):
    """The oracle query's max_abs_err must honor the operator's
    contract: |err| <= scale/2 per element."""
    from scio_db_spark.plans.registry import all_queries

    q = all_queries()["emb_quantize_roundtrip"]
    rows = q.spark(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.max_abs_err <= r.scale / 2 + 1e-12


def test_trained_census_covers_all_vectors(spark):
    from scio_db_spark.plans.registry import all_queries

    q = all_queries()["emb_kmeans_trained_census"]
    rows = q.spark(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_assigned for r in rows)
    n_emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert total == n_emb  # every vector assigned exactly once
    assert all(-1.0 - 1e-12 <= r.min_sim <= r.max_sim <= 1.0 + 1e-12
               for r in rows)
