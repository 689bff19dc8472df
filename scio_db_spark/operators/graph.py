"""Distributed graph operators: integer PageRank, degree-ordered
triangle counting, bounded-hop BFS.

Library cores behind the ``graph_*`` registry queries
(plans/relational.py builds the shipment / co-purchase graphs and
delegates here), factored out so random-graph tests can drive them
directly against Python brute force — the same split the rank core
and cluster operators use.

Scale postures (measured in BENCH_LOCAL_r08_scaling_newops.json):
- ``pagerank``: one equi-join + partial-aggregated groupBy per
  iteration over a lazily-checkpointed edge frame (lineage truncation
  measured 2.7× over cache at sf0.01); rank state is |V| rows.
- ``triangle_counts``: edges oriented from the lower (degree, node)
  endpoint (Schank-Wagner), bounding wedge generation by
  sum C(out_deg, 2) with out-degrees ~sqrt(|E|) — hub-immune.
- ``khop_census``: per-hop frontier equi-join + anti-join against the
  reached set; state bounded by |V|.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PR_SCALE = 1_000_000_000  # fixed-point rank scale (1e9 per node)


_CKPT_ENV = "SCIO_GRAPH_CKPT_DIR"


def checkpointed(edges: DataFrame, eager: bool = False) -> DataFrame:
    """Lineage truncation for a frame consumed by many stages of an
    iterative plan (see module doc; lazy by default so plan-only
    tooling never materializes it).

    Two backends, chosen per session:

    - default: ``localCheckpoint`` — blocks pinned in the executor
      block manager (MEMORY_AND_DISK). Fastest, but a multi-round
      peel over a ~90M-edge frame holds every round's blocks on one
      box: the round-9 graph ×1000 attempt GC-thrashed exactly here
      (SCALE.md round-9 cap note).
    - disk-backed: when the SparkContext has a checkpoint dir (set
      via ``setCheckpointDir`` or the ``SCIO_GRAPH_CKPT_DIR`` env
      var), reliable ``DataFrame.checkpoint`` writes the frame to
      files instead — nothing stays resident in the block manager,
      trading re-read I/O for bounded memory. On a real cluster this
      is the HDFS/object-store checkpoint every long iterative job
      uses; locally it is what lets the ×1000 graph row be measured
      at all (BENCH_LOCAL_r10_scaling_graph_ckpt.json).

    Disk growth: superseded round checkpoints are reclaimed by the
    ContextCleaner because SessionFactory pins
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` (static
    conf, set at context start) — once a loop reassigns its frame
    variable, the old round's files are deleted on the next JVM GC.
    Sessions built OUTSIDE SessionFactory with a checkpoint dir set
    inherit Spark's default (keep forever) and should manage the dir
    themselves (ADVICE r10).
    """
    sc = edges.sparkSession.sparkContext
    ckpt_dir = None
    try:
        ckpt_dir = sc.getCheckpointDir()
    except Exception:  # noqa: BLE001 — older API surface
        ckpt_dir = None
    if ckpt_dir is None:
        env = os.environ.get(_CKPT_ENV)
        if env:
            sc.setCheckpointDir(env)
            ckpt_dir = env
    if ckpt_dir:
        return edges.checkpoint(eager=eager)
    return edges.localCheckpoint(eager=eager)


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    scale: int = PR_SCALE,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Bounded-iteration PageRank over a weighted directed edge frame
    ``(src, dst, w)`` in integer fixed-point: r' = 0.15*scale +
    0.85 * sum_in((r_u * w) / out_u), every step floor-divided in the
    fixed order ``(r*w) DIV ow`` then ``*85 DIV 100`` so products stay
    under 2^63 and any engine reproduces the integers bit-for-bit.
    Nodes = src ∪ dst. Dangling nodes (no out-edge): by default they
    leak their mass (callers may add self-loops); with
    ``redistribute_dangling=True`` the classic uniform redistribution
    runs instead — per iteration, one extra scalar aggregate collects
    the dangling ranks and every node receives
    ``(dsum DIV n_nodes) * 85 DIV 100`` (same floor-div order as the
    per-edge share). In that mode each iteration's rank frame is
    lazily localCheckpoint-ed: two consumers (the contribution join
    and the dangling aggregate) would otherwise double the logical
    tree per iteration — 2^iters plan growth. Returns ``(node, r)``.
    """
    edges = checkpointed(edges)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # Loop-invariant hoist: the node-set distinct and the out-weight
    # join were recomputed (one data-sized exchange each) EVERY
    # iteration — in redistribute mode because each round's rank
    # checkpoint compiles into its own physical plan, and even in the
    # single-plan form the runtime showed no exchange reuse across the
    # repeated subtrees (0 ReusedExchange in the compiled plan; warm
    # interleaved A/B at sf0.1: 14.1→8.9 s plain, 13.0→8.8 s
    # redistribute). Materializing both once is iters× fewer |V|/|E|
    # shuffles (guide §2.4); rows proven identical at every SF.
    nodes = checkpointed(nodes)
    ew = checkpointed(edges.join(outw, "src"))
    ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
    base = scale * 15 // 100  # exact python int, matches oracles
    ncnt = nodes.agg(F.count(F.lit(1)).alias("n")) if (
        redistribute_dangling
    ) else None
    for _ in range(iters):
        if redistribute_dangling:
            ranks = checkpointed(ranks)
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                "dst",
                # integer DIV, never `/`: long/long is DOUBLE in Spark
                # and the numerators exceed 2^53 at scale.
                F.expr("(r * w DIV ow) * 85 DIV 100").alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("inflow"))
        )
        new_ranks = nodes.join(
            contrib.withColumnRenamed("dst", "node"), "node", "left"
        )
        if redistribute_dangling:
            # 1-row x 1-row x |V| broadcasts: the dangling mass and
            # node count ride a scalar cross join (the one-row
            # bounds-broadcast pattern; BNLJ is benign at one row)
            uni = (
                ranks.join(
                    outw.select(F.col("src").alias("node")),
                    "node",
                    "left_anti",
                )
                .agg(F.coalesce(F.sum("r"), F.lit(0)).alias("dsum"))
                .crossJoin(ncnt)
                .select(F.expr("(dsum DIV n) * 85 DIV 100").alias("uni"))
            )
            ranks = new_ranks.crossJoin(F.broadcast(uni)).select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.coalesce(F.col("inflow"), F.lit(0))
                    + F.col("uni")
                ).cast("long").alias("r"),
            )
        else:
            ranks = new_ranks.select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.coalesce(F.col("inflow"), F.lit(0))
                ).cast("long").alias("r"),
            )
    return ranks


def pagerank_personalized(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 5,
    scale: int = PR_SCALE,
) -> DataFrame:
    """Personalized PageRank: identical integer recurrence to
    :func:`pagerank` except the teleport term lands ONLY on the seed
    set — r0 = ``scale`` on seeds / 0 elsewhere, and per iteration
    ``r' = 1[seed] * (15*scale/100) + 0.85 * inflow``. Rank mass
    localizes around the seeds (the graph-feature form recsys and
    node-similarity pipelines actually use); ranks are comparable
    WITHIN a seed set, not across runs with different seeds.
    ``seeds`` is a one-column ``node`` frame (broadcast — seed sets
    are small by definition). Seed nodes ABSENT from the graph are
    silently inert (they have no edges to receive or propagate mass
    through and do not appear in the output); callers wanting
    strictness should semi-join their seed set against the node set
    first. Returns ``(node, r)``.
    """
    edges = checkpointed(edges)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
    )
    flagged = checkpointed(
        nodes.join(
            F.broadcast(seeds.select("node").withColumn("sd", F.lit(1))),
            "node",
            "left",
        ).select("node", F.coalesce(F.col("sd"), F.lit(0)).alias("sd"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("ow"))
    # Same loop-invariant hoist as pagerank: the out-weight join was
    # recomputed every iteration (no runtime exchange reuse observed);
    # warm interleaved A/B at sf0.1: ~11% (all pairs), rows identical.
    ew = checkpointed(edges.join(outw, "src"))
    base = scale * 15 // 100
    ranks = flagged.select(
        "node", (F.col("sd") * F.lit(scale)).cast("long").alias("r")
    )
    for _ in range(iters):
        contrib = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                "dst",
                F.expr("(r * w DIV ow) * 85 DIV 100").alias("share"),
            )
            .groupBy("dst")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = flagged.join(
            contrib.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node",
            (
                F.col("sd") * F.lit(base)
                + F.coalesce(F.col("inflow"), F.lit(0))
            ).cast("long").alias("r"),
        )
    return ranks


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an UNDIRECTED edge
    frame ``(u, v)`` with u < v (deduplicated). Degree-ordered wedge
    join: each triangle is found exactly once at its unique apex.
    Returns ``(node, n_triangles)`` for nodes in >= 1 triangle."""
    # materialize the edge frame once: it feeds the degree census
    # (twice, via the endpoint union) and the orientation join, and
    # callers hand in derived frames (self-join + distinct) that are
    # expensive to recompute per reference — the same discipline the
    # k-core/LPA peels apply to their inputs
    pairs = checkpointed(pairs)
    deg = (
        pairs.select(F.col("u").alias("node"))
        .unionAll(pairs.select("v"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    # every oriented edge goes ≺-low → ≺-high in the (degree, node)
    # total order; t's degree rides along because the wedge filter
    # below must use the SAME ≺ — ordering wedge endpoints by node id
    # alone loses every triangle whose closing edge crosses the two
    # orders (found by the random-graph brute-force test; the id-
    # ordered form passed the oracle because the SQL twin shared the
    # bug — consistent and wrong).
    oe = checkpointed(
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(lower, F.col("v")).otherwise(F.col("u")).alias("t"),
            F.when(lower, F.col("dv")).otherwise(F.col("du"))
            .alias("dt"),
        )
    )
    w1 = oe.select(
        F.col("s"), F.col("t").alias("b"), F.col("dt").alias("db")
    )
    w2 = oe.select(
        F.col("s"), F.col("t").alias("c"), F.col("dt").alias("dc")
    )
    wedges = w1.join(w2, "s").filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = oe.select(F.col("s").alias("b"), F.col("t").alias("c"))
    tri = wedges.join(closing, ["b", "c"]).select(
        F.col("s").alias("a"), "b", "c"
    )
    # one row per (triangle, corner) via explode of the THREE corner
    # columns — NOT a 3-way union of projections of ``tri``, which
    # compiles the wedge join + closing join into three sibling
    # physical subtrees (one per union branch): exchange reuse across
    # them is best-effort, and when it does not fire the most
    # expensive joins in the operator run three times (measured: the
    # sf0.1 census spent 502 of 556 task-seconds in one branch's
    # closing-join stage). The explode keeps exactly one instance of
    # the join subtree in the plan by construction.
    return (
        tri.select(
            F.explode(F.array("a", "b", "c")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def khop_census(
    edges: DataFrame, source, hops: int
) -> DataFrame:
    """Shortest-path distance histogram from ``source`` over a
    directed edge frame ``(src, dst)``: ``(dist, n_nodes)`` for
    dist 0..hops (unreached nodes excluded)."""
    spark = edges.sparkSession
    src_type = edges.schema["src"].dataType
    edges = checkpointed(edges.select("src", "dst").distinct())
    # Seed the frontier in the EDGE frame's key type: a string seed
    # against bigint edges would otherwise equi-join through implicit
    # double casts and mis-match ids beyond 2^53. createDataFrame with
    # an explicit StructType raises loudly on an unrepresentable seed.
    # Eager driver-side seed check: the RDD form below defers schema
    # verification to the executors, but callers rely on an immediate
    # TypeError for an unrepresentable seed (the local-list
    # createDataFrame used to provide it).
    expected_py = {
        "long": int, "integer": int, "short": int, "byte": int,
        "string": str,
    }.get(src_type.typeName())
    if expected_py is not None and (
        not isinstance(source, expected_py) or isinstance(source, bool)
    ):
        raise TypeError(
            f"seed {source!r} is not representable as the edge key "
            f"type {src_type.simpleString()}"
        )
    # One-partition seed (numSlices=1): the no-argument form
    # parallelizes even a one-row list over defaultParallelism
    # Python-RDD partitions, and the empty partitions ride through
    # every frontier union/checkpoint round (round-12 opt).
    reached = spark.createDataFrame(
        spark.sparkContext.parallelize([(source, 0)], 1),
        T.StructType(
            [
                T.StructField("node", src_type, False),
                T.StructField("dist", T.IntegerType(), False),
            ]
        ),
    )
    frontier = reached.select("node")
    for h in range(1, hops + 1):
        neighbors = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        new_nodes = neighbors.join(reached, "node", "left_anti")
        # lazy lineage truncation per hop: reached feeds BOTH the next
        # anti-join and the final census, and frontier feeds the next
        # expansion — without it a deep-BFS caller inherits O(hops)
        # plan depth (round-8 verdict residual, now closed).
        # Checkpoint the frontier FIRST and build reached from its
        # materialized blocks: checkpointing both from `new_nodes`
        # compiled the expansion join + distinct + anti-join into TWO
        # physical plans, evaluating it twice per hop (round-12 opt).
        frontier = checkpointed(new_nodes)
        reached = checkpointed(
            reached.unionByName(frontier.withColumn("dist", F.lit(h)))
        )
    return (
        reached.groupBy("dist")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("dist")
    )


def kcore(
    pairs: DataFrame, k: int, max_iterations: int = 30
) -> DataFrame:
    """Edges of the k-core of an undirected ``(u, v)`` graph (u < v,
    deduplicated): the maximal subgraph where every node keeps degree
    >= k. Synchronous peel — each round removes EVERY node currently
    below k at once (degree recounted against survivors), so rounds =
    peel depth, not node count; each round is one symmetrized degree
    count + two semi-joins, and the surviving edge frame is eagerly
    localCheckpoint-ed (same discipline as the CC star rounds: the
    next round's plan starts from materialized data, not a growing
    lineage). Returns the surviving edge frame; empty when no k-core
    exists. Core-number census use: LLM web-data curation treats core
    number as a spam/quality signal (link farms peel late)."""
    edges, _rounds = _kcore_peel(pairs, k, max_iterations)
    return edges


def kcore_rounds(
    pairs: DataFrame, k: int, max_iterations: int = 30
) -> int:
    """Peel rounds to fixpoint — pins the oracle's unroll margin
    (the SQL twin unrolls a FIXED round count; peeling past the
    fixpoint is a no-op, so the twin is exact iff rounds fit)."""
    _edges, rounds = _kcore_peel(pairs, k, max_iterations)
    return rounds


def label_propagation(pairs: DataFrame, rounds: int) -> DataFrame:
    """Synchronous label propagation over an undirected ``(u, v)``
    graph (u != v, deduplicated): every node starts labeled with its
    own id; each round every node adopts the most frequent label among
    its NEIGHBORS, ties broken by the smallest label — fully
    deterministic (the classic async/random-order LPA is not, which
    is what makes this variant oracle-checkable). Fixed round count,
    synchronous update (all nodes flip on round r+1 from round-r
    labels), so an unrolled SQL twin reproduces labels exactly.

    Communities != components: connected-component clustering
    (operators/clusters.py) merges everything reachable; LPA splits a
    connected graph into locally-dense regions — the signal web-data
    curation uses for host-cluster / spam-farm structure.

    Per round: one equi-join of the symmetric adjacency against the
    |V|-row label frame, a partial-aggregated (node, lab) count, and
    a per-node argmax window (hash exchange on node, no global sort);
    label frames are lazily localCheckpoint-ed so plan depth stays
    O(1) per round. Returns ``(node, lab)``.
    """
    adj = checkpointed(
        pairs.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
        .unionAll(
            pairs.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
        )
        .distinct()
    )
    labels = adj.select("node").distinct().withColumn(
        "lab", F.col("node")
    )
    for _ in range(rounds):
        cnt = (
            adj.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("lab")
                ),
                "nbr",
            )
            .groupBy("node", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # per-node argmax as max_by over (c, -lab): largest count
        # wins, ties take the smallest label — identical to the
        # row_number window this replaces (desc c, asc lab, rn = 1)
        # since (node, lab) rows are unique, but as an AGGREGATE it
        # partial-aggregates map-side and needs no per-partition sort
        # (guide §2.3 "aggregate before you shuffle"); labels are
        # node ids >= 0, so -lab cannot overflow
        labels = checkpointed(
            cnt.groupBy("node").agg(
                F.expr("max_by(lab, struct(c, -lab))").alias("lab")
            )
        )
    return labels


def _kcore_peel(
    pairs: DataFrame, k: int, max_iterations: int
) -> tuple[DataFrame, int]:
    e = checkpointed(
        pairs.select("u", "v")
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        eager=True,
    )
    # Fixpoint test by carried count: each round's survivor count is
    # the NEXT round's baseline, so one count action per round suffices
    # — re-counting e (= last round's kept) and the isEmpty probe were
    # two redundant full scans of the checkpointed edge frame per round
    # (round-12 opt; counts identical by definition, rounds unchanged).
    n_e = e.count()
    for rounds in range(max_iterations + 1):
        sym = e.select(F.col("u").alias("node")).unionAll(
            e.select(F.col("v").alias("node"))
        )
        # NOTE (round-12, measured and kept as-is): the compiled round
        # plan evaluates this aggregation TWICE — once per semi-join
        # leg — because exchange reuse does not fire across the legs.
        # Checkpointing survivors to share one evaluation was measured
        # 1.6x WORSE at sf0.1: the checkpoint scan's UnknownPartitioning
        # forfeits the aggregation's hash(node) partitioning (each leg
        # then re-exchanges the node set) and per-round survivor blocks
        # churn the block manager. The duplicate aggregation keeps its
        # partitioning aligned with each leg's join key.
        survivors = (
            sym.groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("node")
        )
        kept = checkpointed(
            e.join(
                survivors.withColumnRenamed("node", "u"), "u", "left_semi"
            )
            .join(
                survivors.withColumnRenamed("node", "v"), "v", "left_semi"
            )
            .select("u", "v"),
            eager=True,
        )
        n_kept = kept.count()
        if n_kept == n_e:
            return kept, rounds
        e = kept
        n_e = n_kept
        if n_kept == 0:
            return e, rounds + 1
    raise RuntimeError(
        f"k-core peel did not converge in {max_iterations} rounds"
    )
