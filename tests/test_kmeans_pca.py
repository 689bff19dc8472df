"""Lloyd's k-means, distributed PCA, and dedup materialization tests.

These operators have no SQL-expressible oracle (iterative / eigen
decompositions), so correctness is pinned by construction: planted
clusters must be recovered exactly, the distributed partial-Gram PCA
must agree with a single-node numpy PCA on the same data, and the
keep-canonical join must keep exactly one doc per planted duplicate
cluster.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from scio_db_spark.operators.clusters import dedup_keep_canonical
from scio_db_spark.operators.kmeans import assign, kmeans_fit
from scio_db_spark.operators.pca import pca_fit, project


def _planted_clusters(spark, n_per=40, dim=8):
    """Three well-separated unit-vector clusters with small deterministic
    jitter; returns (df, true_label_by_id)."""
    anchors = [
        [1.0] + [0.0] * (dim - 1),
        [0.0, 1.0] + [0.0] * (dim - 2),
        [0.0, 0.0, 1.0] + [0.0] * (dim - 3),
    ]
    rows, truth = [], {}
    vid = 0
    for ci, a in enumerate(anchors):
        for j in range(n_per):
            jitter = [
                0.05 * math.sin(0.7 * vid + 1.3 * d) for d in range(dim)
            ]
            v = [x + e for x, e in zip(a, jitter)]
            rows.append((vid, v))
            truth[vid] = ci
            vid += 1
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    return df.repartition(4), truth


def test_kmeans_recovers_planted_clusters(spark):
    df, truth = _planted_clusters(spark)
    # seed one centroid inside each planted cluster (ids 0, 40, 80)
    seeds = [r.vec for r in df.filter(F.col("id").isin(0, 40, 80)).orderBy("id").collect()]
    model = kmeans_fit(df, "vec", k=3, init_centroids=seeds, max_iters=10)
    assert model.converged
    got = {
        r.id: r.cid for r in assign(df, "vec", model).select("id", "cid").collect()
    }
    # cluster ids must induce exactly the planted partition
    by_true = {}
    for vid, t in truth.items():
        by_true.setdefault(t, set()).add(got[vid])
    assert all(len(s) == 1 for s in by_true.values())
    assert len({next(iter(s)) for s in by_true.values()}) == 3


def test_kmeans_inertia_monotone_and_deterministic(spark):
    df, _ = _planted_clusters(spark)
    m1 = kmeans_fit(df, "vec", k=3, id_col="id", max_iters=6)
    m2 = kmeans_fit(df, "vec", k=3, id_col="id", max_iters=6)
    assert m1.centroids == m2.centroids  # same partitioning → bitwise equal
    hist = m1.inertia_history
    assert all(b <= a + 1e-12 for a, b in zip(hist, hist[1:]))


def test_kmeans_empty_cluster_keeps_centroid(spark):
    df, _ = _planted_clusters(spark)
    # Seed two centroids inside cluster 0 and one far corner: one seed
    # may capture nothing after reassignment; fit must not divide by 0.
    dim = 8
    seeds = [
        [1.0] + [0.0] * (dim - 1),
        [0.9, 0.1] + [0.0] * (dim - 2),
        [0.0] * (dim - 1) + [1.0],
    ]
    model = kmeans_fit(df, "vec", k=3, init_centroids=seeds, max_iters=5)
    assert len(model.centroids) == 3
    for c in model.centroids:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9


def test_pca_matches_single_node_numpy(spark):
    np = pytest.importorskip("numpy")
    df, _ = _planted_clusters(spark, n_per=50)
    model = pca_fit(df, "vec", n_components=3)
    x = np.asarray([r.vec for r in df.orderBy("id").collect()])
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    assert model.n_rows == len(x)
    for got_v, got_l, i in zip(
        model.components, model.explained_variance, order
    ):
        assert abs(got_l - evals[i]) < 1e-8 * max(1.0, abs(evals[i]))
        v = evecs[:, i]
        j = int(np.argmax(np.abs(v)))
        v = v if v[j] >= 0 else -v
        assert np.allclose(got_v, v, atol=1e-8)
    # ratios sum to <= 1 and are descending
    r = model.explained_variance_ratio
    assert all(b <= a for a, b in zip(r, r[1:]))
    assert sum(r) <= 1.0 + 1e-12


def test_pca_project_is_columnar_and_centered(spark):
    np = pytest.importorskip("numpy")
    df, _ = _planted_clusters(spark)
    model = pca_fit(df, "vec", n_components=2)
    out = project(df, "vec", model)
    # no Python stage in the projection plan
    from scio_db_spark.plans.explain import plan_string

    plan = plan_string(out)
    assert "mapinpandas" not in plan.lower()
    assert "BatchEvalPython" not in plan
    rows = out.select("id", "pc1", "pc2").orderBy("id").collect()
    x = np.asarray([r.vec for r in df.orderBy("id").collect()])
    centered = x - np.asarray(model.mean)
    expect = centered @ np.asarray(model.components).T
    got = np.asarray([[r.pc1, r.pc2] for r in rows])
    assert np.allclose(got, expect, atol=1e-9)
    # scores are centered: column means ~ 0
    assert np.allclose(got.mean(axis=0), 0.0, atol=1e-9)


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}") for i in range(10)], "doc_id long, text string"
    )
    # clusters {0,1,2} and {5,6}; 3,4,7,8,9 isolated
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "doc_a long, doc_b long"
    )
    kept = {
        r.doc_id for r in dedup_keep_canonical(docs, pairs).collect()
    }
    assert kept == {0, 3, 4, 5, 7, 8, 9}


def test_kmeans_codebook_improves_over_seed_centroids(spark, sf_dir):
    """Train the IVF-style codebook with Lloyd iterations on the real
    embeddings table: the trained model's mean assignment similarity
    (1 - inertia) must be at least as good as the untrained seed
    census, and assignment must cover every vector exactly once."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    seeds = [
        list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    m0 = kmeans_fit(emb, "embedding", k=8, init_centroids=seeds, max_iters=1)
    m = kmeans_fit(emb, "embedding", k=8, init_centroids=seeds, max_iters=8)
    assert m.inertia_history[-1] <= m0.inertia_history[0] + 1e-12
    assigned = assign(emb, "embedding", m)
    assert assigned.count() == n
    assert assigned.filter(F.col("cid").isNull()).count() == 0
    # every centroid id in range, unit-norm model centroids
    cids = {r.cid for r in assigned.select("cid").distinct().collect()}
    assert cids <= set(range(8))


def test_full_ann_path_codebook_probe_quantized_rerank(spark, sf_dir):
    """Capstone: train the codebook (Lloyd), assign cells, probe the
    2 nearest cells per query, score candidates with int8 quantized
    dot products — recall vs exact cosine top-10 must clear a floor.
    This is the production ANN pipeline (kmeans + quantize operators
    composed), end to end on the real embeddings table."""
    import math

    from pyspark.sql import Window

    from scio_db_spark.operators.quantize import quantize, quantized_dot

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seeds = [
        list(r.embedding)
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    model = kmeans_fit(emb, "embedding", k=8, init_centroids=seeds, max_iters=5)
    assigned = quantize(assign(emb, "embedding", model), "embedding")

    # exact cosine ground truth (driver-side; 500 x 5 is tiny)
    vecs = {r.vec_id: list(r.embedding) for r in emb.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    q_ids = [0, 1, 2, 3, 4]
    truth = {
        q: {
            v
            for v, _ in sorted(
                ((v, cos(vecs[q], x)) for v, x in vecs.items() if v != q),
                key=lambda t: (-t[1], t[0]),
            )[:10]
        }
        for q in q_ids
    }

    # probe: 2 nearest cells per query by centroid cosine
    probes = {}
    for q in q_ids:
        sims = sorted(
            ((cos(vecs[q], c), cid) for cid, c in enumerate(model.centroids)),
            key=lambda t: (-t[0], t[1]),
        )
        probes[q] = {cid for _, cid in sims[:2]}

    qside = assigned.filter(F.col("vec_id").isin(q_ids)).select(
        F.col("vec_id").alias("q_id"),
        F.col("codes").alias("q_codes"),
        F.col("scale").alias("q_scale"),
    )
    probe_rows = [(q, cid) for q, cids in probes.items() for cid in cids]
    probe_df = spark.createDataFrame(probe_rows, "q_id long, cid long")
    cand = assigned.select(
        F.col("vec_id").alias("c_id"),
        F.col("cid").alias("c_cell"),
        F.col("codes").alias("c_codes"),
        F.col("scale").alias("c_scale"),
    )
    scored = (
        qside.join(probe_df, "q_id")
        .join(cand, F.col("cid") == F.col("c_cell"))
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "s", quantized_dot("q_codes", "q_scale", "c_codes", "c_scale")
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("s"), F.asc("c_id"))
    got_rows = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("q_id", "c_id")
        .collect()
    )
    got = {}
    for r in got_rows:
        got.setdefault(r.q_id, set()).add(r.c_id)
    recalls = [len(got.get(q, set()) & t) / len(t) for q, t in truth.items()]
    mean_recall = sum(recalls) / len(recalls)
    # IVF nprobe=2 alone measures ~0.9 here; int8 scoring costs a
    # little more. Floor at 0.5 catches a broken composition outright.
    assert mean_recall >= 0.5, f"composed ANN recall collapsed: {mean_recall}"


def test_assign_handles_single_cluster_model(spark):
    df, _ = _planted_clusters(spark, n_per=10)
    model = kmeans_fit(df, "vec", k=1, id_col="id", max_iters=2)
    out = assign(df, "vec", model)
    assert {r.cid for r in out.select("cid").distinct().collect()} == {0}


def test_pca_zero_variance_returns_zero_ratios(spark):
    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(5)],
        "id long, vec array<double>",
    )
    model = pca_fit(df, "vec", n_components=2)
    assert model.explained_variance_ratio == [0.0, 0.0]
    assert all(abs(v) < 1e-12 for v in model.explained_variance)


def test_poison_vectors_do_not_corrupt_fit(spark):
    """One NaN/Inf vector must not poison centroids or the Gram matrix
    — non-finite rows are dropped in the partial passes."""
    import math as _math

    df, _ = _planted_clusters(spark, n_per=20)
    poison = spark.createDataFrame(
        [
            (900, [float("nan")] * 8),
            (901, [float("inf")] + [0.0] * 7),
        ],
        "id long, vec array<double>",
    )
    dirty = df.unionByName(poison)
    m_clean = kmeans_fit(df, "vec", k=3, id_col="id", max_iters=4)
    m_dirty = kmeans_fit(dirty, "vec", k=3, id_col="id", max_iters=4)
    for c_clean, c_dirty in zip(m_clean.centroids, m_dirty.centroids):
        assert all(_math.isfinite(x) for x in c_dirty)
        assert max(abs(a - b) for a, b in zip(c_clean, c_dirty)) < 1e-12

    p_clean = pca_fit(df, "vec", n_components=2)
    p_dirty = pca_fit(dirty, "vec", n_components=2)
    assert p_dirty.n_rows == p_clean.n_rows  # poison rows excluded
    import numpy as np

    assert np.allclose(p_clean.components, p_dirty.components)


class TestTopkCells:
    """topk_cells: the map-only literal-codebook argmax expression."""

    def _cents(self):
        s = 1.0 / math.sqrt(2.0)
        return [[1.0, 0.0], [0.0, 1.0], [s, s]]

    def test_bit_identity_with_unrolled_dot(self, spark):
        """Every sim must equal _dot_with_literal's unrolled chain at
        repr precision (same contract the DuckDB oracle twin pins)."""
        from scio_db_spark.operators.kmeans import (
            _dot_with_literal,
            topk_cells,
        )

        cents = self._cents()
        df = spark.createDataFrame(
            [(i, [0.31 * i + 0.07, 1.13 - 0.29 * i]) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        wide = df.select(
            "vec_id",
            *[
                _dot_with_literal("embedding", c).alias(f"s{i}")
                for i, c in enumerate(cents)
            ],
        ).collect()
        arr = df.select(
            "vec_id", topk_cells("embedding", cents, len(cents)).alias("p")
        ).collect()
        by_id = {r["vec_id"]: r for r in wide}
        for r in arr:
            got = {p["cid"]: p["sim"] for p in r["p"]}
            for i in range(len(cents)):
                assert repr(got[i]) == repr(by_id[r["vec_id"]][f"s{i}"])

    def test_order_ties_and_zero_norm(self, spark):
        from scio_db_spark.operators.kmeans import topk_cells

        cents = self._cents()
        df = spark.createDataFrame(
            [
                (1, [1.0, 1.0]),   # tie between cid 0 and 1; cid 2 wins
                (2, [0.0, 0.0]),   # zero norm: all sims NULL, cid asc
                (3, [3.0, 0.1]),   # clear winner cid 0
            ],
            "vec_id long, embedding array<double>",
        )
        rows = {
            r["vec_id"]: r["p"]
            for r in df.select(
                "vec_id", topk_cells("embedding", cents, 3).alias("p")
            ).collect()
        }
        # tie on sim -> smaller cid first among the tied pair
        assert [p["cid"] for p in rows[1]] == [2, 0, 1]
        assert rows[1][1]["sim"] == rows[1][2]["sim"]
        # zero-norm: NULL sims sort last overall and cid-ascending
        assert [p["cid"] for p in rows[2]] == [0, 1, 2]
        assert all(p["sim"] is None for p in rows[2])
        assert [p["cid"] for p in rows[3]][0] == 0

    def test_keep_truncates(self, spark):
        from scio_db_spark.operators.kmeans import topk_cells

        df = spark.createDataFrame(
            [(1, [1.0, 2.0])], "vec_id long, embedding array<double>"
        )
        out = df.select(topk_cells("embedding", self._cents(), 2).alias("p"))
        assert len(out.collect()[0]["p"]) == 2
