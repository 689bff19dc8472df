"""Connected components by min-label propagation (dedup clustering).

The final step of near-duplicate detection: candidate pairs (MinHash
LSH, SimHash, embedding near-dups) form edges; each connected component
is one duplicate cluster; the canonical document is the minimum id in
the component ("keep one per cluster").

Spark-first iterative algorithm (no GraphX/graphframes dependency):
label(v) starts as v, then each iteration takes the min label over v and
its neighbors, until a fixpoint. Converges in O(diameter) iterations —
near-dup clusters are shallow (stars/cliques), so typically 2-4. Each
iteration is one shuffle join on the edge list; ``localCheckpoint``
cuts the lineage so plans stay constant-size. This is the standard
large-graph CC formulation: at 100 TB the edge list is orders of
magnitude smaller than the corpus (candidates only), and every step is
an equi-join — no driver-side collection of the graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """(src, dst) edge list → (v, label) with label = min id reachable.

    Vertices are those appearing in edges; isolated docs are their own
    canonical and can be unioned in by the caller.
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint(eager=True)
    )

    converged = False
    for _ in range(max_iterations):
        nbr = (
            sym.join(labels, sym["a"] == labels["v"])
            .select(F.col("b").alias("v"), F.col("label"))
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # Silently-wrong cluster labels would split duplicate clusters
        # downstream — fail loudly instead (raise, never truncate).
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations; raise max_iterations (component diameter "
            "exceeds it)"
        )
    return labels


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Materialize the deduplicated corpus: from a near-duplicate pair
    list (any of the MinHash/SimHash/cosine detectors), keep exactly
    one canonical document per duplicate cluster (the minimum id — the
    cluster label itself) plus every document in no cluster.

    This is the step that turns pair DETECTION into corpus REDUCTION.
    Scale shape: connected_components is iterative equi-joins on the
    (bounded) pair list, then ONE left-anti equi-join of the corpus
    against the non-canonical ids — the corpus streams through a
    single hash join keyed by id, and the anti side is at most
    |pairs| rows, usually a small fraction of the corpus.
    """
    labels = connected_components(
        pairs, src=src, dst=dst, max_iterations=max_iterations
    )
    non_canonical = labels.filter(F.col("v") != F.col("label")).select(
        F.col("v").alias("__dup_id")
    )
    return docs.join(
        non_canonical,
        docs[id_col] == F.col("__dup_id"),
        "left_anti",
    )
