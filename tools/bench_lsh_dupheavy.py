"""Duplication-heavy LSH scaling leg (round-11 verdict item 1).

The round-10 verdict named ONE residual scale-killer: unbounded LSH
band buckets on a duplication-heavy corpus — 30-50% exact duplication
is normal for web crawl, and every exact-dup cluster of size c used to
land c²·BANDS candidate pairs in every band (one viral boilerplate
page = one straggler task at 100 TB). This leg measures the fix
(plans/textops.py::bounded_lsh_pairs — md5 canonical collapse before
banding + hot-bucket cap with census accounting) on a synthetic
corpus whose duplication profile is deliberately hostile:

- ``BENCH_LSH_ROWS`` rows (default 5M ≈ ×1000 the sf0.01 documents
  table), 40% of which are verbatim copies of just ``N_VIRAL`` texts —
  exact-dup clusters of ~40K copies each;
- the remaining 60% carry a per-row suffix token, so they are unique
  by md5 but still near-dup-dense (same base text families).

Legs:

1. ``bounded_x1000`` — bounded_lsh_pairs at full scale: wall time,
   output pair count, star/band split, and per-task max/median of the
   heaviest + most-skewed new stage (flatness is the claim: after
   collapse the viral clusters are 1 banded doc each, so no reducer
   inherits a c² bucket).
2. ``unbounded_x10`` vs ``bounded_x10`` — the OLD all-docs banding
   (no collapse, no cap) against the bounded form at a 10× slice
   (clusters of ~400; the unbounded form at ×1000 would need ~3.2e9
   pairs per cluster — the point of the fix is that this leg CANNOT
   be run). Candidates-per-doc quantifies the quadratic-vs-linear gap.

3. ``viral_singleton`` (round-12, verdict item 1's proof) — ONE text
   duplicated ``BENCH_LSH_VIRAL_COPIES`` times (default 10M) plus 1M
   organic docs. Round 11's windowed canonical/bucket-count stages
   would funnel all 10M copies of the viral page into ONE task before
   dropping them; the round-12 map-side groupBy + broadcast hot/cold
   join form keeps them distributed, so the claim is
   ``worst_record_ratio`` — max over every material new stage of
   per-task RECORDS max/median — ≤ 1.5: a co-located hot key
   piles records into one task regardless of box noise, while the
   time ratios (also reported) additionally rate scheduler jitter
   on a shared 32-thread box.

Output: one JSON line — recorded as BENCH_LOCAL_r{N}_lsh_dupheavy.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from benchgate import preflight_load_gate  # noqa: E402
from bench_skew import _completed_stage_ids, _task_summary  # noqa: E402
from scio_db_spark.session import SessionFactory  # noqa: E402

N_ROWS = int(os.environ.get("BENCH_LSH_ROWS", 5_000_000))
N_VIRAL = 50  # distinct viral texts; each ~N_ROWS*0.4/N_VIRAL copies
DUP_PCT = 40  # share of rows that are verbatim viral copies
#: leg-3 worst case: ONE text duplicated this many times
VIRAL_COPIES = int(os.environ.get("BENCH_LSH_VIRAL_COPIES", 10_000_000))
VIRAL_ORGANIC = 1_000_000  # unique-by-suffix companions in leg 3


def _worst_stage_ratio(spark, before: set[int]) -> dict:
    """max over EVERY new completed stage of task max/median — the
    'no stage anywhere co-locates the viral page' claim needs the
    worst stage, not just the heaviest/most-skewed pair."""
    from bench_skew import _api, _stage_summary

    try:
        stages = _api(spark, "/stages?status=COMPLETE")
    except Exception:  # noqa: BLE001
        return {}
    new = [s for s in stages if s["stageId"] not in before]
    worst, worst_stage, n_rated = 0.0, None, 0
    worst_mat, worst_mat_stage, n_mat = 0.0, None, 0
    worst_rec, worst_rec_stage = 0.0, None
    for s in new:
        summ = _stage_summary(spark, s)
        # per-task RECORD quantiles separate data skew (what a hot
        # key causes and this leg exists to disprove) from duration
        # noise (thread contention on a shared 32-thread box, mixed
        # scan+shuffle-read task types in one stage)
        try:
            q = _api(
                spark,
                f"/stages/{s['stageId']}/0/taskSummary"
                f"?quantiles=0.0,0.5,1.0",
            )
            recs = [
                round(a + b)
                for a, b in zip(
                    (q.get("inputMetrics") or {}).get("recordsRead")
                    or [0, 0, 0],
                    (q.get("shuffleReadMetrics") or {}).get("readRecords")
                    or [0, 0, 0],
                )
            ]
            summ["task_records_min_med_max"] = recs
        except Exception:  # noqa: BLE001
            pass
        med, mx = summ.get("task_ms_median"), summ.get("task_ms_max")
        # sub-100ms medians rate scheduler noise, not data skew
        if not med or not mx or med < 100:
            continue
        n_rated += 1
        if mx / med > worst:
            worst, worst_stage = mx / med, summ
        # material stages: a task under 1s cannot be a 100 TB
        # straggler signal on a 32-thread box — sub-second maxima
        # rate multi-tenant scheduler jitter
        if mx >= 1000:
            n_mat += 1
            if mx / med > worst_mat:
                worst_mat, worst_mat_stage = mx / med, summ
        # the CO-LOCATION claim itself: per-task RECORD max/median of
        # material stages. A hot key funneled into one task shows up
        # here as a huge ratio no matter how fast the box is; a flat
        # record profile with a noisy time profile is scheduler
        # jitter, not skew.
        recs = summ.get("task_records_min_med_max")
        if mx >= 1000 and recs and recs[1] > 0:
            r = recs[2] / recs[1]
            if r > worst_rec:
                worst_rec, worst_rec_stage = r, summ
    return {
        "n_stages": len(new),
        "n_stages_rated": n_rated,
        "worst_stage_ratio": round(worst, 2),
        "worst_stage": worst_stage,
        "n_stages_material": n_mat,
        "worst_material_ratio": round(worst_mat, 2),
        "worst_material_stage": worst_mat_stage,
        "worst_record_ratio": round(worst_rec, 2),
        "worst_record_stage": worst_rec_stage,
    }


def _corpus(spark, n_rows: int):
    """(doc_id, text): 40% viral verbatim copies, 60% unique-by-suffix.

    Text built from expression columns only — no driver-side corpus.
    """
    viral = F.concat(
        F.lit("viral boilerplate page body shared across the crawl "),
        (F.col("id") % N_VIRAL).cast("string"),
        F.lit(
            " lorem ipsum dolor sit amet consectetur adipiscing elit"
            " sed do eiusmod tempor incididunt ut labore et dolore"
            " magna aliqua ut enim ad minim veniam quis nostrud"
        ),
    )
    unique = F.concat(
        F.lit("organic document family "),
        (F.col("id") % 997).cast("string"),
        F.lit(
            " with shared stem vocabulary quick brown fox jumps over"
            " the lazy dog pack my box with five dozen liquor jugs "
        ),
        F.lit("uniq"),
        F.col("id").cast("string"),
    )
    return spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        F.when((F.col("id") % 100) < DUP_PCT, viral)
        .otherwise(unique)
        .alias("text"),
    )


def _measure(spark, fn) -> dict:
    before = _completed_stage_ids(spark)
    t0 = time.perf_counter()
    result = fn()
    out = {"sec": round(time.perf_counter() - t0, 2), "result": result}
    out.update(_task_summary(spark, before))
    return out


def main() -> int:
    _gate = preflight_load_gate("bench_lsh_dupheavy")
    spark = SessionFactory.create("bench-lsh-dupheavy")
    spark.sparkContext.setLogLevel("ERROR")

    from scio_db_spark.plans.textops import (
        _LSH_BUCKET_CAP,
        _bands_of,
        _canonical_split,
        _signature_of_docs,
        bounded_lsh_pairs,
    )

    legs: dict[str, dict] = {}

    # --- leg 1: bounded at full (×1000-equivalent) scale -----------
    d_big = _corpus(spark, N_ROWS)

    def _bounded_big():
        pairs = bounded_lsh_pairs(d_big)
        n_pairs = pairs.count()
        return {"n_pairs": n_pairs}

    legs["bounded_x1000"] = _measure(spark, _bounded_big)

    # census ledger at full scale: buckets over cap + withheld pairs
    canon, star = _canonical_split(d_big)
    buckets = (
        _bands_of(_signature_of_docs(canon))
        .groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    over = F.col("n") > _LSH_BUCKET_CAP
    c2 = F.expr("n * (n - 1) DIV 2")
    ledger = buckets.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("n").alias("max_bucket"),
        F.sum(F.when(over, 1).otherwise(0)).alias("buckets_over_cap"),
        F.sum(F.when(over, c2).otherwise(0)).alias("pairs_dropped"),
    ).collect()[0]
    legs["bounded_x1000"]["census"] = {
        "n_buckets": ledger.n_buckets,
        "max_bucket": ledger.max_bucket,
        "buckets_over_cap": ledger.buckets_over_cap,
        "pairs_dropped": int(ledger.pairs_dropped or 0),
        "n_star_edges": star.count(),
        "n_canonical_docs": canon.count(),
    }

    # --- leg 2: unbounded (pre-fix shape) vs bounded at a 10× slice -
    n_small = max(N_ROWS // 100, 50_000)
    d_small = _corpus(spark, n_small)

    def _unbounded_small():
        bands = _bands_of(_signature_of_docs(d_small))
        a, b = bands.alias("a"), bands.alias("b")
        n = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select("a.doc_id", "b.doc_id")
            .count()
        )
        return {"n_pairs": n, "pairs_per_doc": round(n / n_small, 1)}

    def _bounded_small():
        n = bounded_lsh_pairs(d_small).count()
        return {"n_pairs": n, "pairs_per_doc": round(n / n_small, 1)}

    legs["unbounded_x10"] = _measure(spark, _unbounded_small)
    legs["bounded_x10"] = _measure(spark, _bounded_small)

    # --- leg 3: ONE text duplicated VIRAL_COPIES times --------------
    one_viral = F.lit(
        "single viral page body every crawler in the fleet captured "
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed "
        "do eiusmod tempor incididunt ut labore et dolore magna aliqua"
    )
    organic = F.concat(
        F.lit("organic document family "),
        (F.col("id") % 997).cast("string"),
        F.lit(
            " with shared stem vocabulary quick brown fox jumps over"
            " the lazy dog pack my box with five dozen liquor jugs "
        ),
        F.lit("uniq"),
        F.col("id").cast("string"),
    )
    # interleave viral and organic ids (every (ratio+1)-th id is
    # organic) the way a real crawl does — a contiguous id split
    # would concentrate ALL post-collapse work in the few scan tasks
    # holding organic ids and measure the synthetic layout, not the
    # operator
    ratio = max(VIRAL_COPIES // VIRAL_ORGANIC, 1)
    n3 = VIRAL_COPIES + VIRAL_ORGANIC
    is_organic = F.col("id") % (ratio + 1) == 0
    d_viral = spark.range(n3).select(
        F.col("id").alias("doc_id"),
        F.when(is_organic, organic).otherwise(one_viral).alias("text"),
    )

    def _viral():
        pairs = bounded_lsh_pairs(d_viral)
        viral_member = lambda c: F.col(c) % (ratio + 1) != 0  # noqa: E731
        return {
            "n_pairs": pairs.count(),
            "n_star_edges_viral": pairs.filter(
                viral_member("doc_a") & viral_member("doc_b")
            ).count(),
        }

    before3 = _completed_stage_ids(spark)
    legs["viral_singleton"] = _measure(spark, _viral)
    legs["viral_singleton"].update(_worst_stage_ratio(spark, before3))
    legs["viral_singleton"]["copies"] = VIRAL_COPIES
    legs["viral_singleton"]["organic"] = VIRAL_ORGANIC

    # --- leg 4 (round-12 verdict item 6): the CC CONSUMER itself ---
    # docs_dedup_clusters' connected-components over the bounded
    # pairs + star edges at full dup-heavy scale — pair GENERATION
    # was benched in round 11; this proves the consumer: bounded
    # large-star/small-star rounds-to-converge and per-stage flatness
    # on a graph whose 50 viral clusters are ~40K-member stars.
    from scio_db_spark.operators.clusters import _cc_star

    def _cc_consume():
        labels, rounds = _cc_star(
            bounded_lsh_pairs(d_big), "doc_a", "doc_b", 40
        )
        n_vertices = labels.count()
        n_components = labels.select("label").distinct().count()
        return {
            "cc_rounds": rounds,
            "n_vertices": n_vertices,
            "n_components": n_components,
        }

    before4 = _completed_stage_ids(spark)
    legs["cc_x1000"] = _measure(spark, _cc_consume)
    legs["cc_x1000"].update(_worst_stage_ratio(spark, before4))

    # --- leg 5: CC over the viral-singleton pairs — the consumer's
    # true worst case: ONE star hub with VIRAL_COPIES edges. Hub keys
    # are inherent to the star-edge representation (linear in cluster
    # size — that is the point of the collapse); the question this leg
    # answers is whether the CC rounds stay flat when one key carries
    # 10M rows: the large/small-star MIN aggregates partial-aggregate
    # map-side (hot key never co-locates before reduction), and the
    # 1:1 enrich joins against the per-key min are AQE-skew-splittable.
    def _cc_viral():
        labels, rounds = _cc_star(
            bounded_lsh_pairs(d_viral), "doc_a", "doc_b", 40
        )
        return {
            "cc_rounds": rounds,
            "n_vertices": labels.count(),
            "n_components": labels.select("label").distinct().count(),
        }

    before5 = _completed_stage_ids(spark)
    legs["cc_viral_singleton"] = _measure(spark, _cc_viral)
    legs["cc_viral_singleton"].update(_worst_stage_ratio(spark, before5))

    print(
        json.dumps(
            {
                "metric": "lsh_dupheavy",
                "rows": N_ROWS,
                "dup_pct": DUP_PCT,
                "n_viral_texts": N_VIRAL,
                "bucket_cap": _LSH_BUCKET_CAP,
                "legs": legs,
                "load_1m": list(os.getloadavg())[:2],
                **_gate,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
