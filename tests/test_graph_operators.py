"""Random-graph verification of operators/graph.py against Python
brute force — the registry queries pin the TPC-H-derived graphs via
the DuckDB oracle; these pin the operator cores on adversarial random
topologies (hubs, ties, disconnected pieces, dangling nodes)."""

from __future__ import annotations

import itertools
import random

from scio_db_spark.operators.graph import (
    khop_census,
    pagerank,
    triangle_counts,
)


def _random_pairs(rng, n_nodes, p):
    return [
        (u, v)
        for u, v in itertools.combinations(range(n_nodes), 2)
        if rng.random() < p
    ]


def test_triangle_counts_match_brute_force(spark):
    for seed in range(5):
        rng = random.Random(seed)
        pairs = _random_pairs(rng, 14, 0.35)
        if seed == 3:  # adversarial hub: node 0 connected to everyone
            pairs = sorted(set(pairs) | {(0, v) for v in range(1, 14)})
        adj = {}
        for u, v in pairs:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        expected = {}
        for a, b, c in itertools.combinations(sorted(adj), 3):
            if b in adj[a] and c in adj[a] and c in adj[b]:
                for n in (a, b, c):
                    expected[n] = expected.get(n, 0) + 1
        df = spark.createDataFrame(pairs, "u long, v long")
        got = {
            r.node: r.n_triangles for r in triangle_counts(df).collect()
        }
        assert got == expected, f"seed {seed}"


def test_pagerank_matches_python_recurrence(spark):
    scale = 1_000_000_000
    for seed in range(3):
        rng = random.Random(100 + seed)
        edges = [
            (f"n{u}", f"n{v}", rng.randint(1, 5))
            for u, v in itertools.permutations(range(8), 2)
            if rng.random() < 0.3
        ]
        if not edges:
            continue
        nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
        outw = {}
        for s, _d, w in edges:
            outw[s] = outw.get(s, 0) + w
        r = {n: scale for n in nodes}
        base = scale * 15 // 100
        for _ in range(5):
            inflow = {n: 0 for n in nodes}
            for s, d, w in edges:
                inflow[d] += (r[s] * w // outw[s]) * 85 // 100
            r = {n: base + inflow[n] for n in nodes}
        df = spark.createDataFrame(edges, "src string, dst string, w long")
        got = {row.node: row.r for row in pagerank(df, iters=5).collect()}
        assert got == r, f"seed {seed}"


def test_khop_census_matches_bfs(spark):
    for seed in range(3):
        rng = random.Random(200 + seed)
        edges = [
            (f"n{u}", f"n{v}")
            for u in range(12)
            for v in range(12)
            if u != v and rng.random() < 0.15
        ]
        edges.append(("s1", "n0"))  # guarantee the source exists
        adj = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
        dist = {"s1": 0}
        frontier = ["s1"]
        for h in range(1, 5):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = h
                        nxt.append(v)
            frontier = nxt
        expected = {}
        for d in dist.values():
            expected[d] = expected.get(d, 0) + 1
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r.dist: r.n_nodes
            for r in khop_census(df, "s1", 4).collect()
        }
        assert got == expected, f"seed {seed}"


def test_khop_seed_takes_edge_key_type(spark):
    # long node ids beyond 2^53: a string-typed seed frame would join
    # via implicit double casts and collapse distinct ids (ADVICE r8).
    big = (1 << 60) + 1
    edges = [(big, big + 2), (big + 2, big + 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.dist: r.n_nodes for r in khop_census(df, big, 2).collect()}
    assert got == {0: 1, 1: 1, 2: 1}
    seed_field = khop_census(df, big, 1).schema  # plan builds fine
    assert seed_field is not None


def test_khop_unrepresentable_seed_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(TypeError):
        khop_census(df, "not-a-long", 1)


def test_pagerank_redistributes_dangling_mass(spark):
    scale = 1_000_000_000
    for seed in range(3):
        rng = random.Random(300 + seed)
        # directed edges over 8 nodes; nodes 6 and 7 NEVER source an
        # edge -> guaranteed dangling (plus whatever chance adds)
        edges = [
            (f"n{u}", f"n{v}", rng.randint(1, 5))
            for u in range(6)
            for v in range(8)
            if u != v and rng.random() < 0.3
        ]
        edges.append(("n0", "n7", 1))  # keep the dangling nodes in V
        edges.append(("n1", "n6", 2))
        nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
        outw = {}
        for s, _d, w in edges:
            outw[s] = outw.get(s, 0) + w
        dangling = [n for n in nodes if n not in outw]
        assert dangling, "topology must exercise the redistribution"
        r = {n: scale for n in nodes}
        base = scale * 15 // 100
        for _ in range(5):
            dsum = sum(r[n] for n in dangling)
            uni = (dsum // len(nodes)) * 85 // 100
            inflow = {n: 0 for n in nodes}
            for s, d, w in edges:
                inflow[d] += (r[s] * w // outw[s]) * 85 // 100
            r = {n: base + inflow[n] + uni for n in nodes}
        df = spark.createDataFrame(edges, "src string, dst string, w long")
        got = {
            row.node: row.r
            for row in pagerank(
                df, iters=5, redistribute_dangling=True
            ).collect()
        }
        assert got == r, f"seed {seed}"


def test_pagerank_redistribute_noop_without_dangling(spark):
    """On a graph with no dangling nodes the classic form must be
    bit-identical to the default (uniform term is exactly 0)."""
    edges = [("a", "b", 1), ("b", "c", 2), ("c", "a", 3)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    plain = {r.node: r.r for r in pagerank(df, iters=4).collect()}
    classic = {
        r.node: r.r
        for r in pagerank(
            df, iters=4, redistribute_dangling=True
        ).collect()
    }
    assert plain == classic


def test_kcore_matches_brute_force(spark):
    from scio_db_spark.operators.graph import kcore, kcore_rounds

    for seed in range(4):
        rng = random.Random(400 + seed)
        pairs = _random_pairs(rng, 16, 0.25)
        if seed == 2:  # adversarial: a clique that must survive any k<=5
            pairs = sorted(
                set(pairs) | set(itertools.combinations(range(6), 2))
            )
        if not pairs:
            continue
        for k in (2, 3, 4):
            # python peel
            edges = set(pairs)
            while True:
                deg = {}
                for u, v in edges:
                    deg[u] = deg.get(u, 0) + 1
                    deg[v] = deg.get(v, 0) + 1
                doomed = {n for n, d in deg.items() if d < k}
                if not doomed:
                    break
                edges = {
                    (u, v)
                    for u, v in edges
                    if u not in doomed and v not in doomed
                }
            df = spark.createDataFrame(pairs, "u long, v long")
            got = {(r.u, r.v) for r in kcore(df, k).collect()}
            assert got == edges, f"seed {seed} k {k}"
            assert kcore_rounds(df, k) <= 16


def test_kcore_empty_graph_and_total_peel(spark):
    from scio_db_spark.operators.graph import kcore

    df = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    # a path has no 2-core
    assert kcore(df, 2).count() == 0
    # and trivially survives k=1
    assert kcore(df, 1).count() == 2


def test_kcore_census_rounds_fit_oracle_unroll(spark):
    """The census oracle unrolls a FIXED peel depth; the margin is a
    pinned measurement, not an assumption — at both gate SFs every
    registered k reaches its fixpoint well inside the unroll."""
    from pyspark.sql import functions as F

    from scio_db_spark.operators.graph import kcore_rounds
    from scio_db_spark.plans.catalog import table
    from scio_db_spark.plans.relational import _KCORE_KS, _KCORE_UNROLL

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        l = table(spark, sf, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        a, b = l.alias("a"), l.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("u"),
                F.col("b.l_partkey").alias("v"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        for k in _KCORE_KS:
            r = kcore_rounds(pairs, k, max_iterations=_KCORE_UNROLL)
            assert r <= _KCORE_UNROLL - 4, (sf, k, r)


def test_label_propagation_matches_python_recurrence(spark):
    """Synchronous LPA with smallest-label tie-break, re-derived in
    plain Python on random topologies (including a hub and a
    disconnected piece) — every node's label after R rounds must
    match exactly."""
    from scio_db_spark.operators.graph import label_propagation

    for seed in range(4):
        rng = random.Random(200 + seed)
        pairs = _random_pairs(rng, 12, 0.3)
        if seed == 1:  # hub
            pairs = sorted(set(pairs) | {(0, v) for v in range(1, 12)})
        if seed == 2:  # disconnected clique alongside
            pairs = sorted(
                set(pairs) | {(20, 21), (20, 22), (21, 22)}
            )
        if not pairs:
            continue
        adj = {}
        for u, v in pairs:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        labels = {n: n for n in adj}
        rounds = 3
        for _ in range(rounds):
            nxt = {}
            for n, nbrs in adj.items():
                cnt = {}
                for m in nbrs:
                    cnt[labels[m]] = cnt.get(labels[m], 0) + 1
                # most frequent, ties -> smallest label
                nxt[n] = min(
                    cnt, key=lambda lab: (-cnt[lab], lab)
                )
            labels = nxt
        df = spark.createDataFrame(pairs, "u long, v long")
        got = {
            r.node: r.lab
            for r in label_propagation(df, rounds=rounds).collect()
        }
        assert got == labels, f"seed {seed}"


def test_personalized_pagerank_matches_python_recurrence(spark):
    """Seed-conditional teleport, re-derived in plain Python on random
    digraphs; non-seed nodes must start AND teleport at zero."""
    from scio_db_spark.operators.graph import pagerank_personalized

    scale = 1_000_000_000
    for seed in range(3):
        rng = random.Random(300 + seed)
        edges = [
            (f"n{u}", f"n{v}", rng.randint(1, 5))
            for u, v in itertools.permutations(range(8), 2)
            if rng.random() < 0.3
        ]
        if not edges:
            continue
        nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
        seeds = nodes[:2]
        outw = {}
        for s, _d, w in edges:
            outw[s] = outw.get(s, 0) + w
        r = {n: (scale if n in seeds else 0) for n in nodes}
        base = scale * 15 // 100
        for _ in range(5):
            inflow = {n: 0 for n in nodes}
            for s, d, w in edges:
                inflow[d] += (r[s] * w // outw[s]) * 85 // 100
            r = {
                n: (base if n in seeds else 0) + inflow[n]
                for n in nodes
            }
        df = spark.createDataFrame(edges, "src string, dst string, w long")
        sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
        got = {
            row.node: row.r
            for row in pagerank_personalized(df, sdf, iters=5).collect()
        }
        assert got == r, f"seed {seed}"


def test_disk_backed_checkpoint_matches_and_frees_blocks(spark, tmp_path):
    """With a checkpoint dir set, the iterative ops run on reliable
    disk checkpoints: results identical to the localCheckpoint path
    AND no blocks left pinned in the block manager afterwards (the
    round-9 ×1000 graph cap was GC thrash from exactly that residency —
    see operators/graph.py::checkpointed)."""
    import random

    from scio_db_spark.operators.graph import kcore, label_propagation

    rng = random.Random(7)
    pairs = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(40), rng.randrange(40)) for _ in range(150)
            )
            if a != b
        }
    )
    df = spark.createDataFrame(pairs, "u long, v long")

    base_kcore = sorted(
        (r.u, r.v) for r in kcore(df, 3, max_iterations=30).collect()
    )
    base_lpa = sorted(
        (r.node, r.lab) for r in label_propagation(df, 3).collect()
    )

    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    before = set(dict(sc._jsc.getPersistentRDDs()))
    try:
        sc.setCheckpointDir(str(tmp_path / "graph_ckpt"))
        disk_kcore = sorted(
            (r.u, r.v) for r in kcore(df, 3, max_iterations=30).collect()
        )
        disk_lpa = sorted(
            (r.node, r.lab) for r in label_propagation(df, 3).collect()
        )
        persistent = {
            i
            for i in dict(sc._jsc.getPersistentRDDs())
            if i not in before
        }
    finally:
        # restore: None isn't accepted; point the shared session's dir
        # at a scratch location and rely on per-test isolation
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            spark._jvm.scala.Option.apply(None)
        )
    assert disk_kcore == base_kcore
    assert disk_lpa == base_lpa
    assert not persistent, (
        f"disk-backed checkpoint must not pin block-manager blocks, "
        f"found {len(persistent)}"
    )
