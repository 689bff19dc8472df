"""Streaming (mini-batch) k-means: continuous codebook maintenance.

Keeps the IVF/SemDeDup codebook (operators/kmeans.py) fresh as the
corpus streams in: each micro-batch runs the SAME one-pass partial
assignment (vectorized mapInPandas, ≤ k rows per partition) and blends
each touched cluster's batch mean into the model with a FIXED
per-batch decay — ``c ← normalize((1 − α) · c + α · batch_mean)``
with ``α = 1 − 0.5^(1/half_life_batches)``. The blend weight is
per-batch, NOT per-row-count: a trickle batch moves a centroid as far
as a bulk batch (choose the half-life for the expected batch cadence;
per-count Sculley weighting would instead scale α by the batch's
share of the cluster's effective history — a caller needing that can
shorten/lengthen half_life_batches per stream volume). Clusters
absent from a batch keep their centroid (no decay toward zero).

Driver state is the k×dim model only; the stream itself carries no
keyed state (the engine-side state stores stay free for the dedup
operators). This is the standard mini-batch k-means update (Sculley,
WWW'10) expressed in the micro-batch model: each foreachBatch call is
one mini-batch step.
"""

from __future__ import annotations

import math
from dataclasses import replace

from pyspark.sql import DataFrame

from scio_db_spark.operators.kmeans import (
    KMeansModel,
    _normalize,
    _partial_stats_fn,
    _PARTIAL_SCHEMA,
)


class StreamingKMeans:
    """Mutable wrapper evolving a KMeansModel over micro-batches."""

    def __init__(self, model: KMeansModel, half_life_batches: float = 3.0):
        self.model = replace(
            model, centroids=[list(c) for c in model.centroids]
        )
        # per-batch retention factor from the half-life
        self.keep = 0.5 ** (1.0 / max(half_life_batches, 1e-9))
        self.batches_seen = 0

    def update(self, batch_df: DataFrame, vec_col: str) -> KMeansModel:
        """One mini-batch step; returns the updated model."""
        partials = batch_df.select(vec_col).mapInPandas(
            _partial_stats_fn(self.model.centroids, vec_col),
            _PARTIAL_SCHEMA,
        ).collect()
        if not partials:
            return self.model
        dim = len(self.model.centroids[0])
        n_by: dict[int, int] = {}
        sum_by: dict[int, list[float]] = {}
        sim_total, n_total = 0.0, 0
        for r in sorted(partials, key=lambda r: r.cid):
            n_by[r.cid] = n_by.get(r.cid, 0) + r.n
            prev = sum_by.get(r.cid, [0.0] * dim)
            sum_by[r.cid] = [a + b for a, b in zip(prev, r.vec_sum)]
            sim_total += r.sim_sum
            n_total += r.n
        alpha = 1.0 - self.keep
        new_cents = []
        for cid, c in enumerate(self.model.centroids):
            if n_by.get(cid):
                mean = [x / n_by[cid] for x in sum_by[cid]]
                blended = [
                    (1.0 - alpha) * a + alpha * b for a, b in zip(c, mean)
                ]
                new_cents.append(_normalize(blended))
            else:
                new_cents.append(list(c))  # untouched cluster: no decay
        self.batches_seen += 1
        self.model = replace(
            self.model,
            centroids=new_cents,
            inertia_history=self.model.inertia_history
            + [1.0 - sim_total / n_total if n_total else 0.0],
            iterations=self.model.iterations + 1,
        )
        return self.model

    def foreach_batch(self, vec_col: str):
        """Handler for ``writeStream.foreachBatch`` — one update per
        micro-batch."""

        def _handler(batch_df: DataFrame, _epoch: int) -> None:
            self.update(batch_df, vec_col)

        return _handler


def drift(a: KMeansModel, b: KMeansModel) -> float:
    """Max centroid movement between two models (L2)."""
    return max(
        math.sqrt(sum((x - y) * (x - y) for x, y in zip(ca, cb)))
        for ca, cb in zip(a.centroids, b.centroids)
    )
