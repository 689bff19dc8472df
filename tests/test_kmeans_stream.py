"""Mini-batch streaming k-means: tracking, stability, stream wiring."""

from __future__ import annotations

import math
from dataclasses import replace

from pyspark.sql import Row

from scio_db_spark.operators.kmeans import KMeansModel, _normalize
from scio_db_spark.streaming.kmeans_stream import StreamingKMeans, drift


def _cluster_batch(spark, anchor, n=30, start_id=0, wobble=0.0):
    dim = len(anchor)
    rows = []
    for i in range(n):
        vid = start_id + i
        v = [
            a + wobble + 0.03 * math.sin(0.9 * vid + 1.1 * d)
            for d, a in enumerate(anchor)
        ]
        rows.append(Row(id=vid, vec=v))
    return spark.createDataFrame(rows, "id long, vec array<double>")


def _model(anchors):
    return KMeansModel(centroids=[_normalize(a) for a in anchors])


def test_update_moves_centroids_toward_batch_mean(spark):
    a0 = [1.0, 0.0, 0.0, 0.0]
    a1 = [0.0, 1.0, 0.0, 0.0]
    skm = StreamingKMeans(_model([a0, a1]), half_life_batches=1.0)
    # batch drawn from a drifted version of cluster 0 only
    drifted = [0.8, 0.0, 0.6, 0.0]
    before = replace(skm.model, centroids=[list(c) for c in skm.model.centroids])
    skm.update(_cluster_batch(spark, drifted), "vec")
    after = skm.model
    # centroid 0 moved toward the drifted anchor…
    d_target = _normalize(drifted)
    dist_before = math.dist(before.centroids[0], d_target)
    dist_after = math.dist(after.centroids[0], d_target)
    assert dist_after < dist_before
    # …and untouched centroid 1 did not move at all
    assert after.centroids[1] == before.centroids[1]
    # unit norm preserved
    for c in after.centroids:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-9


def test_repeated_batches_converge_to_stationary_source(spark):
    a0 = [1.0, 0.0, 0.0, 0.0]
    a1 = [0.0, 1.0, 0.0, 0.0]
    skm = StreamingKMeans(_model([a0, a1]), half_life_batches=2.0)
    b0 = _cluster_batch(spark, [0.9, 0.1, 0.0, 0.0])
    b1 = _cluster_batch(spark, [0.1, 0.9, 0.0, 0.0], start_id=100)
    both = b0.unionByName(b1)
    drifts = []
    prev = skm.model
    for _ in range(5):
        cur = skm.update(both, "vec")
        drifts.append(drift(prev, cur))
        prev = replace(cur, centroids=[list(c) for c in cur.centroids])
    # movement shrinks as the model locks onto the stationary source
    assert drifts[-1] < drifts[0]
    assert drifts[-1] < 0.05
    # inertia history recorded per batch
    assert len(skm.model.inertia_history) == 5


def test_foreach_batch_wiring_on_a_real_stream(spark, tmp_path):
    import tempfile

    indir = tempfile.mkdtemp(prefix="skm_in_")
    _cluster_batch(spark, [1.0, 0.0, 0.0, 0.0]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(indir)
    skm = StreamingKMeans(
        _model([[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]])
    )
    stream = spark.readStream.schema("id long, vec array<double>").parquet(
        indir
    )
    q = (
        stream.writeStream.foreachBatch(skm.foreach_batch("vec"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert skm.batches_seen >= 1
    assert len(skm.model.inertia_history) >= 1
