"""Persisted ANN index lifecycle at scale (round-11 verdict item 4).

BENCH_LOCAL_r09_knn_ivf.json measured build-vs-probe amortization for
an IN-SESSION index. This lane measures the PERSISTED lifecycle the
registered emb_ivf_index_lifecycle_census pins for correctness, at
×10/×100/×1000 the sf0.01 embeddings table:

- ``build_sec``   — one-time ingest cost: cell-assign the corpus
  against the broadcast codebook and write the cid-clustered index
  parquet + snapshot manifest.
- ``merge_sec``   — freshness cost: MERGE-upsert a 1% batch of new
  vectors through sinks/maintenance.py::upsert_keys (atomic, snapshot
  isolated). The claim: cost scales with |batch| + |touched files|,
  not corpus size — a rebuild-free index.
- ``probe_sec``   — best-of-N query-only latency: read the snapshot,
  probe nprobe cells for the standard query set, exact re-rank inside
  probed cells. The claim: flat in corpus size up to cell-size
  growth, and orders below build_sec — the amortization a 100 TB
  deployment lives on.
- ``brute_sec``   — the brute-force cosine top-k at the same factor,
  for the probe-vs-exhaustive gap.

Output: one JSON line — recorded as BENCH_LOCAL_r11_ann_index.json.
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

from pyspark.sql import functions as F  # noqa: E402

from benchgate import preflight_load_gate  # noqa: E402
from bench_scaling import _CACHE, _build  # noqa: E402
from scio_db_spark.session import SessionFactory  # noqa: E402

FACTORS = (10, 100, 1000)
PASSES = 3
# Production-shaped codebook: the probed fraction is
# nprobe x |queries| / cells. The registered census pins the toy
# 16-cell codebook for oracle parity (probes 10/16 = 62% of the
# corpus — no amortization story); this lane uses 256 cells so the
# probe reads ~4%, the sqrt-n economics a real deployment sets.
CELLS = 256


def main() -> int:
    _gate = preflight_load_gate("bench_ann_index")
    spark = SessionFactory.create("bench-ann-index")
    spark.sparkContext.setLogLevel("ERROR")

    from scio_db_spark.plans.vecops import (
        _ivf_centroids,
        ivf_index_rows_np,
        ivf_probe,
        ivf_probe_queries,
    )
    from scio_db_spark.sinks.maintenance import (
        publish_snapshot,
        read_snapshot,
        upsert_keys,
    )
    from scio_db_spark.functions.vectors import (
        SPARK_AT,
        cosine_sql,
    )

    result: dict[str, dict] = {}
    for factor in FACTORS:
        sf_dir = _build(factor)
        e = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        )
        n_rows = e.count()
        cent = _ivf_centroids(e, cells=CELLS)
        idx = os.path.join(_CACHE, f"ivf_index_lifecycle_x{factor}")
        shutil.rmtree(idx, ignore_errors=True)

        # --- build: all but the last 1% of vec_ids ----------------
        cut = e.agg(
            F.expr("percentile(vec_id, 0.99)").cast("long")
        ).collect()[0][0]
        t0 = time.perf_counter()
        ivf_index_rows_np(
            e.filter(F.col("vec_id") <= cut), cent
        ).repartition(32, "cid").sortWithinPartitions("cid").write.mode(
            "overwrite"
        ).parquet(idx)
        publish_snapshot(idx)
        build_sec = round(time.perf_counter() - t0, 2)

        # --- merge: the remaining 1% arrives later ----------------
        t0 = time.perf_counter()
        stats = upsert_keys(
            spark,
            idx,
            "vec_id",
            ivf_index_rows_np(e.filter(F.col("vec_id") > cut), cent),
        )
        merge_sec = round(time.perf_counter() - t0, 2)

        # --- probe-only, index reused across passes ---------------
        best = float("inf")
        n_out = 0
        for _ in range(PASSES):
            t0 = time.perf_counter()
            n_out = ivf_probe(
                read_snapshot(spark, idx), ivf_probe_queries(e, cent)
            ).count()
            best = min(best, time.perf_counter() - t0)
        probe_sec = round(best, 3)

        # --- brute-force reference at the same factor -------------
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
        )
        cos = F.expr(cosine_sql("q_emb", "embedding", SPARK_AT))
        from pyspark.sql import Window

        w = Window.partitionBy("q_id").orderBy(
            F.desc("cos_sim"), F.asc("vec_id")
        )
        t0 = time.perf_counter()
        (
            F.broadcast(q)
            .join(e, q["q_id"] != e["vec_id"])
            .select("q_id", "vec_id", cos.alias("cos_sim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .count()
        )
        brute_sec = round(time.perf_counter() - t0, 2)

        # --- update churn (round-12 verdict item 4): 10 MERGEs of
        # OVERLAPPING key slices (0.5% of existing vec_ids each — the
        # re-ingest-corrected-vectors pattern), probing after every
        # merge. The insert-only leg above never exercised the
        # delete/rewrite path (rows_deleted=0); this one must show
        # rows_deleted > 0 and files_rewritten > 0 per merge, probe
        # latency FLAT across the churn (index freshness under
        # UPDATE load, not just growth), and the fragmentation curve
        # (file count) with a final compact() + probe.
        from scio_db_spark.sinks.maintenance import (
            _parquet_files,
            compact,
        )

        churn: list[dict] = []
        for i in range(10):
            batch = ivf_index_rows_np(
                e.filter(
                    (F.col("vec_id") % 200 == i)
                    & (F.col("vec_id") <= cut)
                ),
                cent,
            )
            t0 = time.perf_counter()
            cstats = upsert_keys(spark, idx, "vec_id", batch)
            c_merge = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            ivf_probe(
                read_snapshot(spark, idx), ivf_probe_queries(e, cent)
            ).count()
            churn.append(
                {
                    "merge_sec": c_merge,
                    "probe_sec": round(time.perf_counter() - t0, 3),
                    "rows_deleted": cstats.get("rows_deleted"),
                    "rows_upserted": cstats.get("rows_upserted"),
                    "files_rewritten": cstats.get("files_rewritten"),
                    "n_files": len(_parquet_files(idx)),
                }
            )
        t0 = time.perf_counter()
        compact(spark, idx, sort_by=["cid"])  # restore cid clustering
        compact_sec = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        n_post = ivf_probe(
            read_snapshot(spark, idx), ivf_probe_queries(e, cent)
        ).count()
        probe_post_compact = round(time.perf_counter() - t0, 3)
        assert n_post == n_out, (n_post, n_out)  # churn is pure update

        result[str(factor)] = {
            "rows": n_rows,
            "build_sec": build_sec,
            "merge_sec": merge_sec,
            "merge_stats": stats,
            "probe_sec": probe_sec,
            "probe_rows": n_out,
            "brute_sec": brute_sec,
            "update_churn": churn,
            "compact_sec": compact_sec,
            "n_files_post_compact": len(_parquet_files(idx)),
            "probe_sec_post_compact": probe_post_compact,
        }
        print(
            f"x{factor}: build={build_sec} merge={merge_sec} "
            f"probe={probe_sec} brute={brute_sec}",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "ann_index_lifecycle",
                "passes": PASSES,
                "cells": CELLS,
                "factors": result,
                "load_1m": list(os.getloadavg())[:2],
                **_gate,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
