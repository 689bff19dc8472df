"""Measured skew harness: hot-key aggregation and AQE skew-join split.

The repo's skew story (operators/skew.py salting, bandjoin.py:15-18's
"AQE's skew-join split applies" note) was argued, not measured. This
lane builds a hot-key dataset — ONE key holding 10% of a 20M-row fact,
the rest uniform over 1M keys — and measures, with per-task time
distributions from the local REST API:

1. **agg_algebraic**: plain ``groupBy(key).agg(sum/count/max)`` vs
   ``salted_agg(n_salts=32)``. Expectation stated up front: partial
   (map-side) aggregation already collapses a hot key per map task for
   algebraic functions, so salting should NOT win here — the
   measurement documents that salting is not free insurance.
2. **agg_collect**: plain ``groupBy(key).agg(collect_list)`` vs the
   salted two-phase form (collect per (key, salt), flatten-merge).
   Here map-side partials cannot shrink the hot key (every row's value
   must cross the exchange into one reducer), so this is the regime
   salting exists for.
3. **join_skew**: fact ⋈ dim (1M-row dim, sort-merge forced) with AQE
   skew-join split OFF vs ON. The hot fact partition (~2M rows vs a
   ~300K median at 64 shuffle partitions) is exactly the shape the
   epsilon band join's shuffle inherits — its candidate join is an
   ordinary shuffle equi-join on the band key (bandjoin.py), so this
   leg validates that module's AQE claim without manufacturing the
   quadratic pair output a genuinely hot BAND implies (any two values
   in one eps-band are within eps — output-bound by definition, not a
   join-strategy problem).

Per-task max/median come from the heaviest new stage of each measured
action (GET /api/v1/applications/<app>/stages + taskSummary). Output:
one JSON line {"metric": "skew_harness", "legs": {...}} — recorded as
BENCH_LOCAL_r{N}_skew.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from benchgate import preflight_load_gate  # noqa: E402
from scio_db_spark.operators.skew import salted_agg  # noqa: E402
from scio_db_spark.session import SessionFactory  # noqa: E402

N_FACT = int(os.environ.get("BENCH_SKEW_ROWS", 20_000_000))
N_KEYS = 1_000_000
N_DIM = N_KEYS
# 1/share of rows land on key 0: 10 = the verdict's 10% hot key;
# 2 = a 50% mega-key, to locate the salting CROSSOVER (salting costs
# a full extra shuffle — it only pays once the hot reducer's work
# exceeds that).
HOT_SHARES = [10, 2]
SHUFFLE_PARTS = 64


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def _completed_stage_ids(spark) -> set[int]:
    try:
        return {
            s["stageId"] for s in _api(spark, "/stages?status=COMPLETE")
        }
    except Exception:  # noqa: BLE001 — UI disabled: degrade to timings
        return set()


def _stage_summary(spark, stage: dict) -> dict:
    out = {
        "stage_id": stage["stageId"],
        "num_tasks": stage.get("numCompleteTasks"),
    }
    try:
        q = _api(
            spark,
            f"/stages/{stage['stageId']}/0/taskSummary"
            f"?quantiles=0.5,1.0",
        )
        run = q.get("executorRunTime") or q.get("duration") or []
        out["task_ms_median"] = round(run[0], 1) if run else None
        out["task_ms_max"] = round(run[1], 1) if len(run) > 1 else None
    except Exception:  # noqa: BLE001
        pass
    return out


def _task_summary(spark, before: set[int]) -> dict:
    """Per-task times of the heaviest AND the most-skewed new stage.

    The skew signal lives in the REDUCE stage, which is rarely the
    heaviest by total executor time on a hot-cache box (the scan is);
    report both so the artifact carries the reducer's max/median."""
    try:
        stages = _api(spark, "/stages?status=COMPLETE")
    except Exception:  # noqa: BLE001
        return {}
    new = [s for s in stages if s["stageId"] not in before]
    if not new:
        return {}
    summaries = [_stage_summary(spark, s) for s in new]

    def _ratio(s: dict) -> float:
        med, mx = s.get("task_ms_median"), s.get("task_ms_max")
        return (mx / med) if med and mx else 0.0

    heavy = max(
        summaries,
        key=lambda s: (s.get("task_ms_max") or 0)
        * (s.get("num_tasks") or 0),
    )
    skewed = max(summaries, key=_ratio)
    out = {"heaviest_stage": heavy}
    if skewed["stage_id"] != heavy["stage_id"]:
        out["most_skewed_stage"] = skewed
    return out


def _measure(spark, fn, passes: int = 2) -> dict:
    best = None
    for _ in range(passes):
        before = _completed_stage_ids(spark)
        t0 = time.perf_counter()
        fn()
        elapsed = time.perf_counter() - t0
        if best is None or elapsed < best["sec"]:
            best = {"sec": round(elapsed, 2), **_task_summary(spark, before)}
    return best


def main() -> int:
    _gate_stamps = preflight_load_gate("bench_skew")
    spark = SessionFactory.create("bench-skew")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(SHUFFLE_PARTS))

    cache = os.environ.get("BENCH_SKEW_CACHE", "/tmp/bench_skew_cache")
    dim_p = os.path.join(cache, f"dim_{N_DIM}")
    if not os.path.exists(dim_p):
        spark.range(N_DIM).select(
            F.col("id").alias("k"),
            F.concat(F.lit("label_"), F.col("id")).alias("label"),
        ).write.mode("overwrite").parquet(dim_p)
    dim = spark.read.parquet(dim_p)

    facts = {}
    for share in HOT_SHARES:
        fact_p = os.path.join(cache, f"fact_{N_FACT}_h{share}")
        if not os.path.exists(fact_p):
            # hot key 0 takes every share-th row; spread the rest
            spark.range(N_FACT).select(
                F.when(F.col("id") % share == 0, F.lit(0))
                .otherwise(F.col("id") % N_KEYS)
                .alias("k"),
                (F.col("id") % 1000).alias("amount"),
                (F.col("id") % 99991).alias("v"),
            ).write.mode("overwrite").parquet(fact_p)
        facts[share] = spark.read.parquet(fact_p)

    legs: dict[str, dict] = {}

    for share, fact in facts.items():
        pct = 100 // share
        # 1. algebraic agg: partial aggregation should already absorb
        # the hot key — salting adds a shuffle for nothing. Measure to
        # prove it at both hot shares.
        legs[f"agg_algebraic_plain_hot{pct}"] = _measure(
            spark,
            lambda: fact.groupBy("k")
            .agg(F.sum("amount"), F.count(F.lit(1)), F.max("v"))
            .agg(F.count(F.lit(1)))
            .collect(),
        )
        legs[f"agg_algebraic_salted_hot{pct}"] = _measure(
            spark,
            lambda: salted_agg(
                fact, ["k"],
                {"s": ("sum", "amount"), "n": ("count", F.lit(1)),
                 "mx": ("max", "v")},
                n_salts=32,
            ).agg(F.count(F.lit(1))).collect(),
        )

        # 2. collect agg: every hot-key row crosses the exchange — the
        # regime salting exists for; the hot-share sweep locates the
        # crossover (salting = one extra full shuffle, so it pays only
        # once the hot reducer's list build dominates the job).
        legs[f"agg_collect_plain_hot{pct}"] = _measure(
            spark,
            lambda: fact.groupBy("k")
            .agg(F.collect_list("v").alias("vs"))
            .select(F.size("vs").alias("n"))
            .agg(F.max("n"), F.count(F.lit(1)))
            .collect(),
        )
        legs[f"agg_collect_salted_hot{pct}"] = _measure(
            spark,
            lambda: salted_agg(
                fact, ["k"], {"vs": ("collect_list", "v")}, n_salts=32
            )
            .select(F.size("vs").alias("n"))
            .agg(F.max("n"), F.count(F.lit(1)))
            .collect(),
        )

    # 3. AQE skew-join split on a sort-merge join (the band join's
    # candidate-join shape) at the 10% hot share. Thresholds lowered
    # so the ~30MB hot partition actually trips the splitter on a
    # test box; both runs share them, only skewJoin.enabled differs.
    # Broadcast disabled — a broadcast hash join has no reduce-side
    # partition to skew.
    fact = facts[10]
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "4MB",
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB"
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    def _join():
        return (
            fact.join(dim, "k")
            .agg(F.count(F.lit(1)), F.sum("amount"))
            .collect()
        )

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    legs["join_skew_aqe_off"] = _measure(spark, _join)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    legs["join_skew_aqe_on"] = _measure(spark, _join)
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    print(
        json.dumps(
            {
                "metric": "skew_harness",
                "fact_rows": N_FACT,
                "hot_shares_pct": [100 // s for s in HOT_SHARES],
                "n_keys": N_KEYS,
                "shuffle_partitions": SHUFFLE_PARTS,
                "legs": legs,
                "load_1m": list(os.getloadavg())[:2],
                **_gate_stamps,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
