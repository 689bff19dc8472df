"""Connected components for dedup clustering — bounded-round star
algorithm, with the min-label propagation baseline kept for reference.

The final step of near-duplicate detection: candidate pairs (MinHash
LSH, SimHash, embedding near-dups) form edges; each connected component
is one duplicate cluster; the canonical document is the minimum id in
the component ("keep one per cluster").

Two implementations, identical output contract ((v, label) with label =
min id of v's component; the DuckDB oracle is the same recursive-CTE
fixpoint for both):

- ``connected_components`` (default): alternating LARGE-STAR /
  SMALL-STAR (Kiveris et al., "Connected Components in MapReduce and
  Beyond", SoCC 2014 — public algorithm). Each operation is one
  grouped aggregation + one equi-join on the edge list; rounds are
  O(log² n) worst case and a handful in practice, INDEPENDENT of
  component diameter. This matters at 100 TB because one pathological
  chain-shaped dup cluster (boilerplate runs, near-identical page
  sequences) would otherwise serialize the whole job into a
  diameter-long chain of Spark jobs.
- ``connected_components_propagation``: the previous min-label
  propagation — one neighbor-min join per round, O(diameter) rounds.
  Kept as the measured baseline for the scaling harness
  (tools/bench_scaling.py --cc-chain) and for tiny shallow graphs
  where its per-round cost is marginally lower.

Neither touches the corpus: the edge list (candidates only) is orders
of magnitude smaller, every step is an equi-join or grouped agg —
no driver-side collection of the graph.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@contextmanager
def _no_constraint_propagation(spark):
    """Catalyst workaround, scoped to the CC rounds: computing
    constraints over some union-bearing input plans throws
    ``java.util.NoSuchElementException: key not found: <attr>`` from
    ``UnionBase.rewriteConstraints`` (observed when the edge source is
    ``bounded_lsh_pairs``' star-edge union and the frame is then
    localCheckpoint'd — the optimizer's InferFiltersFromConstraints
    walks the union's constraint set with a stale attribute map).
    CC plans already carry their predicates explicitly (``a != b``,
    ``b > a``) so inferred constraints buy nothing here; disabling
    propagation for the duration of the CC rounds sidesteps the bug
    without touching any other query's plan. The previous value is
    restored even on failure."""
    key = "spark.sql.constraintPropagation.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _ckpt_eager(df: DataFrame) -> DataFrame:
    """Eager lineage truncation routed through the graph module's
    backend chooser: localCheckpoint by default, disk-backed reliable
    checkpoint when a checkpoint dir / SCIO_GRAPH_CKPT_DIR is set
    (operators/graph.py::checkpointed — the round-10 bounded-memory
    path for iterative frames)."""
    from scio_db_spark.operators.graph import checkpointed

    return checkpointed(df, eager=True)

def _symmetrize(e: DataFrame) -> DataFrame:
    # NO distinct: the consumers aggregate with MIN (duplicate
    # neighbors can't change a min) and the emit sets are distinct'd
    # downstream — the dedup shuffle here was pure cost.
    return e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )


#: Per-key row count above which the star joins route the key through
#: a broadcast instead of the shuffle join. Star-edge inputs make hub
#: keys INHERENT (one canonical ↔ every cluster member — linear in
#: cluster size, which is the point of the exact-dup collapse), and a
#: 10M-copy viral page measured a 33× per-task record pile-up in the
#: large-star enrich join before this split (AQE's skew-join split
#: only fires past ~256 MB per partition — a mid-size hot key sails
#: under it). The hot-key list is bounded by rows/threshold, so the
#: broadcast is small by construction.
_CC_HOT_KEY_THRESHOLD = 1_000_000


def _join_min_skew_safe(
    rows: DataFrame, mins: DataFrame, key: str = "a"
) -> DataFrame:
    """Enrich ``rows`` (many rows per key) with ``mins`` (exactly one
    row per key, carrying that key's row count as ``__hc``) on
    ``key``, hot keys routed broadcast-side.

    Cold keys take the ordinary shuffle equi-join; keys with more
    than ``_CC_HOT_KEY_THRESHOLD`` rows join against a BROADCAST of
    their min rows, so a hub key's rows stay distributed across scan
    partitions instead of co-locating in one reducer. ``__hc`` rides
    the SAME aggregate that computes the min (one partial-aggregated
    shuffle total — a separate hot-key count cost ~1.6x on the
    CC-consuming censuses, caught by the round-12 full-registry
    lane); it is consumed here and dropped from the output."""
    hot_keys = mins.filter(
        F.col("__hc") > _CC_HOT_KEY_THRESHOLD
    ).select(key)
    mins = mins.drop("__hc")
    hot_mins = F.broadcast(mins.join(hot_keys, key, "left_semi"))
    cold = rows.join(
        F.broadcast(hot_keys), key, "left_anti"
    ).join(mins, key)
    hot = rows.join(
        F.broadcast(hot_keys), key, "left_semi"
    ).join(hot_mins, key)
    return cold.unionByName(hot)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """(src, dst) edge list → (v, label) with label = min id reachable.

    Alternating large-star/small-star; see module docstring. Vertices
    are those appearing in edges; isolated docs are their own
    canonical and can be unioned in by the caller.
    """
    labels, _rounds = _cc_star(edges, src, dst, max_iterations)
    return labels


def cc_star_rounds(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> int:
    """Rounds the star algorithm took to reach its fixpoint — the
    scaling harness's measurement hook."""
    _labels, rounds = _cc_star(edges, src, dst, max_iterations)
    return rounds


def _cc_star(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iterations: int,
) -> tuple[DataFrame, int]:
    with _no_constraint_propagation(edges.sparkSession):
        return _cc_star_impl(edges, src, dst, max_iterations)


def _cc_star_impl(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iterations: int,
) -> tuple[DataFrame, int]:
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .transform(_ckpt_eager)
    )
    n_e = e.count()  # checkpointed scan — cheap; also the empty probe
    if n_e == 0:
        # no edges: every vertex would be isolated; empty label frame
        return (
            e.select(F.col("a").alias("v"), F.col("b").alias("label")),
            0,
        )
    for rounds in range(1, max_iterations + 1):
        # A hub key with more than _CC_HOT_KEY_THRESHOLD rows needs at
        # least that many edges, so small rounds provably cannot have
        # one — they take the plain join (the split's anti/semi double
        # scan + broadcast subqueries cost ~1.6x on the CC-consuming
        # censuses when applied unconditionally; round-12 full-
        # registry lane).
        skew_safe = 2 * n_e > _CC_HOT_KEY_THRESHOLD
        # LARGE-STAR: per node u, connect every LARGER neighbor to
        # m = min(Γ(u) ∪ {u}). Output edges all point "down" toward
        # local minima; connectivity is preserved (SoCC'14, Lemma 1).
        sym = _symmetrize(e)
        lmin = sym.groupBy("a").agg(
            F.min("b").alias("__mn"),
            F.count(F.lit(1)).alias("__hc"),
        )
        lmin = lmin.select(
            "a",
            F.least(F.col("a"), F.col("__mn")).alias("__m"),
            "__hc",
        )
        e1 = (
            (
                _join_min_skew_safe(sym, lmin)
                if skew_safe
                else sym.join(lmin.drop("__hc"), "a")
            )
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("__m").alias("b"))
            .distinct()
        )
        # SMALL-STAR: per node u, route u and its SMALLER neighbors to
        # m = min of that set. Every output edge (v, m) has m < v, so
        # the result is canonically oriented. Large-star's output is
        # ALREADY canonically oriented (it emits (v, m) with v > u >=
        # m only), so the symmetrize-then-filter(b < a) the textbook
        # form starts from is an identity here — e1 IS the grouped
        # view, one union+filter shuffle saved per round.
        grp = e1
        smin = grp.groupBy("a").agg(
            F.min("b").alias("__m"),
            F.count(F.lit(1)).alias("__hc"),
        )
        out1 = (
            (
                _join_min_skew_safe(grp, smin)
                if skew_safe
                else grp.join(smin.drop("__hc"), "a")
            )
            .filter(F.col("b") != F.col("__m"))
            .select(F.col("b").alias("a"), F.col("__m").alias("b"))
        )
        out2 = smin.select("a", F.col("__m").alias("b"))
        e2 = (
            out1.unionByName(out2)
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .transform(_ckpt_eager)
        )
        # In-round fixpoint test — no confirm round (which would
        # double the rounds on the shallow graphs dedup actually
        # produces): e2 is a star FOREST iff no edge target is also a
        # source AND no source carries two targets. A star forest
        # spanning each original component must be centered at the
        # component MINIMUM (edges always point down, so the min can't
        # be a leaf), so stopping here yields the correct labels.
        # distinct() BEFORE the join: e2's b side repeats each
        # component min once per member (10M identical values for a
        # 10M-copy viral page — measured as a 33x per-task record
        # pile-up in the join's shuffle), and only EXISTENCE matters
        # here. distinct is a partial aggregate, so the hot value
        # collapses map-side and the join left side is <=1 row/key.
        chained = e2.select(F.col("b").alias("x")).distinct().join(
            e2.select(F.col("a").alias("x")), "x"
        )
        multi = (
            e2.groupBy("a")
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") > 1)
        )
        not_star = (
            chained.select(F.lit(1).alias("one"))
            .unionByName(multi.select(F.lit(1).alias("one")))
            .limit(1)
            .count()
        )
        if not_star == 0:
            labels = e2.select(
                F.col("a").alias("v"), F.col("b").alias("label")
            ).unionByName(
                e2.select(F.col("b").alias("v")).distinct()
                .withColumn("label", F.col("v"))
            )
            return labels, rounds
        e = e2
        n_e = e2.count()  # feeds the next round's skew_safe gate
    # Silently-wrong cluster labels would split duplicate clusters
    # downstream — fail loudly instead (raise, never truncate).
    raise RuntimeError(
        f"connected_components (star) did not converge in "
        f"{max_iterations} rounds; raise max_iterations"
    )


def connected_components_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Min-label propagation baseline: O(diameter) rounds, one
    neighbor-min join each. Superseded by the star algorithm as the
    default (bounded rounds); kept for the measured comparison in
    tools/bench_scaling.py --cc-chain.
    """
    with _no_constraint_propagation(edges.sparkSession):
        return _cc_propagation_impl(edges, src, dst, max_iterations)


def _cc_propagation_impl(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iterations: int,
) -> DataFrame:
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.distinct().transform(_ckpt_eager)

    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .transform(_ckpt_eager)
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
            .transform(_ckpt_eager)
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
        raise RuntimeError(
            f"connected_components_propagation did not converge in "
            f"{max_iterations} iterations; raise max_iterations "
            "(component diameter exceeds it)"
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
    Scale shape: connected_components is a bounded number of equi-join
    rounds on the (bounded) pair list, then ONE left-anti equi-join of
    the corpus against the non-canonical ids — the corpus streams
    through a single hash join keyed by id, and the anti side is at
    most |pairs| rows, usually a small fraction of the corpus.
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
