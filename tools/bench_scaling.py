"""Scaling curve: run headline plans at 1x / 10x / 100x the sf0.1 data.

The correctness gate runs at toy scale; this tool answers the scale
question with measurements instead of assertions. It derives larger
datasets by replicating the FACT tables k times with key offsets
(dimensions stay fixed — more facts per dimension key, the realistic
growth direction), then times a representative query per plan family
at each factor. A plan that is data-linear shows ~k-proportional
growth on top of a fixed session overhead; a plan hiding a
super-linear stage (quadratic candidate generation, driver funnel,
skew collapse) shows up immediately.

Replication is perf-only (no oracle at derived scales — the gate SFs
own correctness): doc/vec/event/order keys are offset per copy so
uniqueness invariants hold; document TEXT and embedding VECTORS are
copied verbatim, which deliberately makes the dedup/ANN families'
worst case HARDER as the factor grows (every doc gains k-1 exact
near-duplicates, so candidate pairs grow ~k·C(k,2) per group).

Usage:
    python tools/bench_scaling.py [--factors 1,10,100] [--passes N]
        [--out FILE] [--queries name1,name2]

Derived data is cached under .scale_cache/ (gitignored); one JSON
line on stdout: {"metric": "scaling_curve", "factors": [...],
"queries": {name: {factor: sec}}, "rows": {factor: {table: n}}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

_SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_CACHE = os.path.join(_REPO_ROOT, ".scale_cache")

# fact table -> key column to offset per copy
_FACTS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
_DIMS = ["region", "nation", "customer", "supplier", "part"]

_QUERIES = [
    "q01_pricing_summary",        # fact scan + wide agg
    "q03_shipping_priority",      # multi-join + topk
    "events_windowed_counts",     # time-window agg
    "basket_part_pairs_topk",     # pair mining (bounded expansion)
    "docs_duplicate_spans",       # explode + span agg (1 shuffle)
    "docs_minhash_lsh_pairs",     # dedup band join (k-1 dups/doc!)
    "emb_cosine_topk",            # brute-force ANN baseline
    "events_heavy_users_exact",   # MG candidates + exact verify
    "events_scd2_user_state",     # keyed windows, output ~ input
    "events_rolling_anomaly_census",  # running integer windows + decimal
    "decile_customer_revenue",    # range-partitioned two-pass quantile
    "emb_ann_ivf_trained_topk",   # trained-codebook cell equi-join ANN
    "events_top_paths",           # sessionize + path trigrams
    "events_rolling_7d_actives",  # contribution-explode rolling distinct
    "orders_snapshot_cdc_diff",   # key-partitioned full outer join (CDC)
    "orders_incremental_agg_census",  # mergeable-state re-aggregation
    # round-7 families
    "docs_ppjoin_similarity_pairs",   # prefix-filter exact sim join
    "events_value_twins_eps",         # epsilon band equi-join
    "docs_dedup_clusters",            # bounded-round star CC
    "events_purchase_attribution",    # bounded as-of (one merge fill)
    "cust_pareto_skyline",            # running-max rank-core rider
    # round-8 families
    "graph_pagerank_supplier_customer",  # 5-iteration integer PR
    "graph_triangle_census",             # degree-ordered wedge join
    "graph_khop_reach_census",           # frontier-expansion BFS
    "docs_token_cms_topk",               # mergeable count-min sketch
    "emb_knn_label_census",              # 20-query kNN vote
    "orders_priority_sample_total_estimate",  # DLT estimator census
    "orders_benford_digit_census",       # digit-distribution DQ
    "docs_source_diversity_census",      # quantized-entropy census
    # round-9 families
    "emb_knn_ivf_label_census",          # IVF-probe kNN vote (swap-in)
    "docs_token_hll_estimate",           # deterministic-register HLL
    "events_latency_quantile_sketch",    # log-grid quantile histogram
    "graph_pagerank_purchase_flow",      # classic PR (dangling mass)
    "graph_kcore_census",                # iterative peel decomposition
    "docs_bloom_membership_census",      # fixed-word-table crawl screen
    "docs_quality_classifier_census",    # hashed-BoW integer scorer
    "graph_lpa_community_census",        # 4-round label propagation
    "graph_ppr_seed_suppliers",          # personalized PR (seed teleport)
    "events_distinct_users_hll_rollup",  # day-cell max-merge rollup
    "mm_wav_pcm_roundtrip",              # real WAV codec Arrow throughput
    "mm_bmp_rgb_roundtrip",              # real BMP codec Arrow throughput
    "emb_matryoshka_recall_census",      # prefix-dim vs full-dim overlap
]

# Per-query factor cap, RECORDED in the artifact (the no-silent-caps
# rule). The round-8 ×1000 column runs the near-flat/linear families;
# the ×100-output-bound ones are capped at 100 — their cost at ×1000
# is the PAIR OUTPUT the verbatim-replication harness inflates
# (999 exact copies/doc → ~k² pairs/doc; 250M+ result rows), not a
# plan defect — the ×1/×10/×100 curves in BENCH_LOCAL_r07_scaling.json
# already characterize them. emb_* are capped because the replication
# multiplies the query set as well (quadratic brute-force / rerank
# work by construction).
_MAX_FACTOR: dict[str, int] = {
    "basket_part_pairs_topk": 100,       # pair expansion output-bound
    "docs_duplicate_spans": 100,         # shingle-pair output-bound
    "docs_minhash_lsh_pairs": 100,       # k²/doc pair output (r6 lesson)
    "docs_dedup_clusters": 100,          # edge list = LSH pairs
    "docs_ppjoin_similarity_pairs": 100, # intra-group pairs ~ C(1000,2)/doc
    "events_value_twins_eps": 100,       # band-pair output-bound
    "emb_cosine_topk": 100,              # brute force: queries × corpus
    "emb_ann_ivf_trained_topk": 100,     # candidate set × query set
    "emb_knn_label_census": 100,         # 20 queries × replicated corpus
    "emb_knn_ivf_label_census": 100,     # same query-set replication
    "emb_matryoshka_recall_census": 100, # two brute-force pair scans
    # The iterative graph families are NOT output-bound (keys are
    # offset per copy, edges scale linearly) but their ×1000 form —
    # multi-round peel/propagation with per-round checkpoints over a
    # ~90M-edge co-purchase replica, three k values for kcore — GC-
    # thrashed the single local JVM when attempted (round 9); on a
    # cluster each round stays the same linear join+agg. ×100 curves
    # (flat) are the committed evidence.
    "graph_kcore_census": 100,
    "graph_lpa_community_census": 100,
    "graph_pagerank_purchase_flow": 100,
    "graph_ppr_seed_suppliers": 100,
    # codec roundtrips are linear per record by construction; the
    # ×100 point (500k containers) is the committed throughput
    # evidence and ×1000 would only re-measure the same per-record
    # cost for 50 minutes.
    "mm_wav_pcm_roundtrip": 100,
    "mm_bmp_rgb_roundtrip": 100,
}


def _build(factor: int) -> str:
    if factor == 1:
        return _SRC
    out = os.path.join(_CACHE, f"x{factor}")
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    import duckdb

    con = duckdb.connect()
    # Stream the COPY instead of buffering it: with insertion-order
    # preservation (the default) DuckDB materializes the ENTIRE cross
    # product in memory before writing — at x1000 that's 600M lineitem
    # rows (~40+ GB RSS, observed). Row order inside the replicated
    # parquet is irrelevant to every query here.
    con.execute("SET preserve_insertion_order=false")
    con.execute("SET memory_limit='24GB'")
    for t in _DIMS:
        shutil.copyfile(
            os.path.join(_SRC, f"{t}.parquet"),
            os.path.join(out, f"{t}.parquet"),
        )
    for t, key in _FACTS.items():
        src = os.path.join(_SRC, f"{t}.parquet")
        stride = con.execute(
            f"SELECT max({key}) + 1 FROM read_parquet('{src}')"
        ).fetchone()[0]
        con.execute(
            f"COPY (SELECT * REPLACE ({key} + i * {stride} AS {key}) "
            f"FROM read_parquet('{src}'), range({factor}) t(i)) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    open(marker, "w").write("ok")
    return out


def _rank_psweep(passes: int, out_path: str | None) -> int:
    """Fixed data, growing partition count: the per-row boundary-probe
    cost is the one rank-core constant that scales with CLUSTER size
    (P ≈ 2-3× cores), not data size. Flat-ish seconds across the sweep
    = the probe is sub-linear in P (two-level √P search above
    _TWO_LEVEL_MIN_P); the round-6 linear probe grew ~P here."""
    from pyspark.sql import functions as F

    from scio_db_spark.operators.rank import _with_pid
    from scio_db_spark.session import SessionFactory
    from benchgate import preflight_load_gate

    _gate_stamps = preflight_load_gate("bench_rank_psweep")
    spark = SessionFactory.create("bench-rank-psweep")
    spark.sparkContext.setLogLevel("ERROR")
    # The probe is isolated from the downstream windows deliberately:
    # varying P also varies the window shuffle's TASK count, and on
    # local[32] with gate-sized data the scheduler overhead of 2048
    # tiny tasks swamps the per-row signal this sweep exists to
    # measure. The __pid projection alone runs at the scan's task
    # count regardless of P, so seconds here ∝ per-row probe cost.
    sf_dir = _build(100)  # 10M events
    ev = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).select(F.col("value"), F.col("event_id"), F.col("event_type"))
    n = ev.count()
    # Two order specs per P: the native-struct fast path (numeric
    # DESC folded by bitwise-NOT/negation) and the lexicographic
    # COMPARATOR path (string DESC has no order-reversing transform),
    # which round 8 moved onto the same two-level sqrt(P) probe — the
    # comparator column should now show the same flat-ish curve
    # instead of the old linear-in-P growth.
    specs = {
        "native": [F.desc("value"), F.asc("event_id")],
        "comparator": [F.desc("event_type"), F.asc("event_id")],
    }
    times: dict[str, dict[str, float]] = {k: {} for k in specs}
    for p in (32, 256, 1024, 2048):
        for kind, order in specs.items():
            pided = _with_pid(
                ev, order, num_partitions=p, sample_mod=64
            )
            pided.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(passes):
                t0 = time.perf_counter()
                pided.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            times[kind][str(p)] = round(best, 3)
            print(f"P={p} {kind}: {times[kind][str(p)]}", file=sys.stderr)
    result = {
        "metric": "rank_probe_psweep",
        "rows": n,
        "passes": passes,
        "seconds_by_partitions": times["native"],
        "seconds_by_partitions_comparator": times["comparator"],
        "load_1m": list(os.getloadavg()[:2]),
        **_gate_stamps,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


def _knn_ivf_lane(passes: int, out_path: str | None) -> int:
    """Two-phase kNN-IVF scaling: the census query's inline form pays
    the full-corpus cell ASSIGNMENT (k=45 dots/vector) on every run —
    at 20 eval queries that is MORE arithmetic than the 20-dot brute
    force, so the one-shot census can't beat it (126.9 vs 104.7 s at
    ×100, BENCH_LOCAL_r09_scaling_newops.json). In production the
    inverted list is INGEST-TIME state, built once per corpus and
    amortized over every query batch (the same economics as zorder
    clustering). This lane measures the two phases separately:
    build_sec writes the index parquet once per factor; probe_sec
    times the 20-query census reading it (query-side assignment of
    the 20 probe vectors stays inside probe_sec — that IS query-time
    work). The probe column is the swap-in curve the exact census's
    queries×corpus product is swapped OUT for."""
    from scio_db_spark.plans.libops import (
        _KM_SQRTN,
        _KNN_IVF_QUERIES,
        _SQRTN_NPROBE,
        _trained_cells,
        knn_ivf_index,
        knn_ivf_vote,
    )
    from pyspark.sql import functions as F

    from scio_db_spark.session import SessionFactory
    from benchgate import preflight_load_gate

    _gate_stamps = preflight_load_gate("bench_knn_ivf")
    spark = SessionFactory.create("bench-knn-ivf")
    spark.sparkContext.setLogLevel("ERROR")
    result: dict[str, dict[str, float]] = {}
    for factor in (1, 10, 100):
        sf_dir = _build(factor)
        e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        idx_path = os.path.join(_CACHE, f"knn_ivf_index_x{factor}")
        t0 = time.perf_counter()
        knn_ivf_index(e).write.mode("overwrite").parquet(idx_path)
        build_sec = round(time.perf_counter() - t0, 3)
        inv = spark.read.parquet(idx_path)
        best = float("inf")
        for _ in range(passes):
            qprobe = _trained_cells(
                e.filter(F.col("vec_id") < _KNN_IVF_QUERIES),
                keep=_SQRTN_NPROBE,
                cents=_KM_SQRTN,
                extra=("label",),
            ).select(
                F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("q_emb"),
                F.col("label").alias("true_label"),
                F.col("nrm").alias("q_nrm"),
                "cid",
            )
            t0 = time.perf_counter()
            n = knn_ivf_vote(inv, qprobe).count()
            best = min(best, time.perf_counter() - t0)
        result[str(factor)] = {
            "build_sec": build_sec,
            "probe_sec": round(best, 3),
            "census_rows": n,
        }
        print(f"x{factor} build={build_sec} probe={best:.3f}",
              file=sys.stderr)
    line = json.dumps(
        {"metric": "knn_ivf_two_phase", "passes": passes,
         "factors": result, **_gate_stamps}
    )
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


def _scd2_spill_lane(passes: int, out_path: str | None) -> int:
    """Pin the SCD2 ×1000 spill story with metrics, not assertions.

    events_scd2_user_state grew 14.3× for 10× data at ×1000
    (BENCH_LOCAL_r08_scaling_x1000.json); SCALE.md attributed it to
    per-key window-sort spill at the default 32 shuffle partitions
    (100M rows / 32 ≈ 3.1M rows per sort buffer) — asserted, never
    measured. This lane runs the registered query at ×1000 across a
    shuffle-partition sweep and scrapes task spill totals
    (memoryBytesSpilled / diskBytesSpilled) from the Spark REST API
    per run. If the hypothesis holds, spill bytes collapse and
    wall-time flattens as partitions grow ∝ data — a CONFIG lever
    (partitions ∝ data is exactly what a real cluster sets), not a
    plan defect; if not, the plan needs work and this artifact says
    so."""
    import json as _json
    import urllib.request

    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.session import SessionFactory
    from benchgate import preflight_load_gate

    _gate_stamps = preflight_load_gate("bench_scd2_spill")
    spark = SessionFactory.create("bench-scd2-spill")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = _build(1000)
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    def _completed_stages() -> list[dict]:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            return _json.load(r)

    run = all_queries()["events_scd2_user_state"].spark
    results: dict[str, dict] = {}
    for p in (32, 128, 512):
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        best: dict | None = None
        for _ in range(passes):
            prev = {s["stageId"] for s in _completed_stages()}
            t0 = time.perf_counter()
            run(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = time.perf_counter() - t0
            new = [
                s for s in _completed_stages() if s["stageId"] not in prev
            ]
            entry = {
                "sec": round(sec, 3),
                "memory_spill_gb": round(
                    sum(s["memoryBytesSpilled"] for s in new) / 2**30, 2
                ),
                "disk_spill_gb": round(
                    sum(s["diskBytesSpilled"] for s in new) / 2**30, 2
                ),
                "stages": len(new),
            }
            if best is None or entry["sec"] < best["sec"]:
                best = entry
        results[str(p)] = best
        print(f"P={p}: {best}", file=sys.stderr)
    line = json.dumps(
        {"metric": "scd2_spill_sweep", "factor": 1000,
         "passes": passes, "by_partitions": results, **_gate_stamps}
    )
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


def _cc_chain(passes: int, out_path: str | None) -> int:
    """Worst-case-diameter connected components: a chain built from
    real doc_ids. Star CC (default) must hold rounds ~log n while the
    propagation baseline's rounds = diameter — the pathological dup
    graph (boilerplate runs) that would serialize a 100-TB dedup job
    into a diameter-long chain of Spark rounds."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from scio_db_spark.operators.clusters import (
        cc_star_rounds,
        connected_components,
        connected_components_propagation,
    )
    from scio_db_spark.session import SessionFactory
    from benchgate import preflight_load_gate

    _gate_stamps = preflight_load_gate("bench_cc_chain")
    spark = SessionFactory.create("bench-cc-chain")
    spark.sparkContext.setLogLevel("ERROR")
    ids = (
        spark.read.parquet(os.path.join(_SRC, "documents.parquet"))
        .select("doc_id")
    )
    result: dict[str, dict] = {}
    for n in (256, 2048, 20000):
        chain = (
            ids.orderBy("doc_id")
            .limit(n)
            .withColumn(
                "nxt",
                F.lead("doc_id").over(Window.orderBy("doc_id")),
            )
            .filter(F.col("nxt").isNotNull())
            .select(
                F.col("doc_id").alias("src"), F.col("nxt").alias("dst")
            )
            .localCheckpoint(eager=True)
        )
        t0 = time.perf_counter()
        rounds = cc_star_rounds(chain, max_iterations=40)
        star_sec = round(time.perf_counter() - t0, 2)
        entry: dict = {"star_rounds": rounds, "star_sec": star_sec}
        if n <= 256:
            # propagation at larger n = n Spark rounds — measured only
            # where that is affordable; the point is the rounds column
            t0 = time.perf_counter()
            connected_components_propagation(
                chain, max_iterations=n + 1
            )
            entry["propagation_rounds"] = n - 1
            entry["propagation_sec"] = round(time.perf_counter() - t0, 2)
        # correctness at every n: one component labeled by the min id
        labs = connected_components(chain, max_iterations=40)
        distinct = labs.select("label").distinct().count()
        entry["components"] = distinct
        result[str(n)] = entry
        print(f"chain n={n}: {entry}", file=sys.stderr)
    out = {
        "metric": "cc_chain_rounds",
        "chains": result,
        "load_1m": list(os.getloadavg()[:2]),
        **_gate_stamps,
    }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


def main() -> int:
    if "--scd2-spill" in sys.argv:
        return _scd2_spill_lane(
            int(sys.argv[sys.argv.index("--passes") + 1])
            if "--passes" in sys.argv
            else 2,
            sys.argv[sys.argv.index("--out") + 1]
            if "--out" in sys.argv
            else None,
        )
    if "--knn-ivf" in sys.argv:
        return _knn_ivf_lane(
            int(sys.argv[sys.argv.index("--passes") + 1])
            if "--passes" in sys.argv
            else 2,
            sys.argv[sys.argv.index("--out") + 1]
            if "--out" in sys.argv
            else None,
        )
    if "--cc-chain" in sys.argv:
        return _cc_chain(
            1,
            sys.argv[sys.argv.index("--out") + 1]
            if "--out" in sys.argv
            else None,
        )
    if "--rank-psweep" in sys.argv:
        return _rank_psweep(
            int(sys.argv[sys.argv.index("--passes") + 1])
            if "--passes" in sys.argv
            else 2,
            sys.argv[sys.argv.index("--out") + 1]
            if "--out" in sys.argv
            else None,
        )
    factors = [
        int(x)
        for x in (
            sys.argv[sys.argv.index("--factors") + 1]
            if "--factors" in sys.argv
            else "1,10,100"
        ).split(",")
    ]
    passes = (
        int(sys.argv[sys.argv.index("--passes") + 1])
        if "--passes" in sys.argv
        else 2
    )
    out_path = (
        sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else None
    )
    names = (
        sys.argv[sys.argv.index("--queries") + 1].split(",")
        if "--queries" in sys.argv
        else _QUERIES
    )
    # --lift-caps q1,q2: remove the factor cap for the named queries
    # in THIS invocation (recorded in the artifact) — the round-10
    # path for re-attempting the graph x1000 rows with disk-backed
    # checkpoints (SCIO_GRAPH_CKPT_DIR) instead of block-manager
    # residency.
    lifted = (
        sys.argv[sys.argv.index("--lift-caps") + 1].split(",")
        if "--lift-caps" in sys.argv
        else []
    )
    for n in lifted:
        _MAX_FACTOR.pop(n, None)

    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.session import SessionFactory
    from benchgate import preflight_load_gate

    _gate_stamps = preflight_load_gate("bench_scaling")
    spark = SessionFactory.create("bench-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    times: dict[str, dict[int, float]] = {n: {} for n in names}
    rows: dict[int, dict[str, int]] = {}
    for factor in factors:
        sf_dir = _build(factor)
        rows[factor] = {
            t: spark.read.parquet(
                os.path.join(sf_dir, f"{t}.parquet")
            ).count()
            for t in _FACTS
        }
        for name in names:
            cap = _MAX_FACTOR.get(name)
            if cap is not None and factor > cap:
                print(
                    f"x{factor} {name}: SKIPPED (capped at x{cap}, "
                    f"see _MAX_FACTOR)",
                    file=sys.stderr,
                )
                times[name][factor] = None
                continue
            best = float("inf")
            for _ in range(passes):
                t0 = time.perf_counter()
                # noop sink: full evaluation without funneling the
                # result through the driver — at 100x a result-heavy
                # query (scd2 emits ~rows) would otherwise benchmark
                # driver transfer, not the plan.
                q[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            times[name][factor] = round(best, 3)
            print(f"x{factor} {name}: {times[name][factor]}", file=sys.stderr)

    result = {
        "metric": "scaling_curve",
        "src": _SRC,
        "factors": factors,
        "passes": passes,
        "rows": rows,
        "queries": {
            n: {str(f): t for f, t in fs.items()} for n, fs in times.items()
        },
        "factor_caps": _MAX_FACTOR,
        "lifted_caps": lifted,
        "graph_ckpt_dir": os.environ.get("SCIO_GRAPH_CKPT_DIR"),
        "load_1m": list(os.getloadavg()[:2]),
        **_gate_stamps,
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
