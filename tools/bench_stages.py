"""Per-stage empirical profile of the headline queries (guide §1).

No Spark UI in this sandbox, so the measurement path is the event log:
run every headline query through the noop sink with a job description
label, then parse the JSON event log into per-query / per-stage task
metrics (task time, shuffle read/write bytes+time, GC, max/median task
time = the skew signal of guide §2.5).

Usage:
    python tools/bench_stages.py [query ...]        # default: all headline
    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... python tools/bench_stages.py

Prints one JSON line per query plus a per-stage breakdown table to
stderr; the JSON lines are the machine-readable record.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def _median(xs: list[float]) -> float:
    if not xs:
        return 0.0
    s = sorted(xs)
    return s[len(s) // 2]


def parse_eventlog(path: str) -> dict:
    """job id -> description; stage id -> metrics, mapped per job."""
    jobs: dict[int, dict] = {}
    stage_of_job: dict[int, int] = {}
    stages: dict[int, dict] = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jid = ev["Job ID"]
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", ""
                )
                jobs[jid] = {"desc": desc, "stages": ev.get("Stage IDs", [])}
                for sid in ev.get("Stage IDs", []):
                    stage_of_job[sid] = jid
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                info = ev.get("Task Info") or {}
                st = stages.setdefault(
                    sid,
                    {
                        "n_tasks": 0,
                        "task_ms": [],
                        "gc_ms": 0,
                        "shuffle_read_b": 0,
                        "fetch_wait_ms": 0,
                        "shuffle_write_b": 0,
                        "shuffle_write_ms": 0,
                        "input_b": 0,
                        "spill_b": 0,
                        "python_ms": 0,
                    },
                )
                st["n_tasks"] += 1
                dur = (info.get("Finish Time", 0) or 0) - (
                    info.get("Launch Time", 0) or 0
                )
                st["task_ms"].append(dur)
                st["gc_ms"] += tm.get("JVM GC Time", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                st["shuffle_read_b"] += srm.get(
                    "Local Bytes Read", 0
                ) + srm.get("Remote Bytes Read", 0)
                st["fetch_wait_ms"] += srm.get("Fetch Wait Time", 0)
                swm = tm.get("Shuffle Write Metrics") or {}
                st["shuffle_write_b"] += swm.get("Shuffle Bytes Written", 0)
                st["shuffle_write_ms"] += (
                    swm.get("Shuffle Write Time", 0) // 1_000_000
                )
                im = tm.get("Input Metrics") or {}
                st["input_b"] += im.get("Bytes Read", 0)
                st["spill_b"] += tm.get("Disk Bytes Spilled", 0)
    return {"jobs": jobs, "stages": stages, "stage_of_job": stage_of_job}


def main() -> int:
    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.session import SessionFactory

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    evdir = tempfile.mkdtemp(prefix="scio_evlog_")
    spark = SessionFactory.create(
        "bench-stages",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()
    names = sys.argv[1:] or [
        n for n, s in sorted(q.items()) if s.headline and not s.effectful
    ]
    # warm-up (unlabelled): JIT + parquet footers, like bench.py
    for name in names:
        q[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    walls: dict[str, float] = {}
    for name in names:
        sc = spark.sparkContext
        sc.setJobDescription(f"Q::{name}")
        t0 = time.perf_counter()
        q[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        walls[name] = round(time.perf_counter() - t0, 4)
        sc.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()
    time.sleep(1.0)
    # Spark 4 layout: <dir>/eventlog_v2_<app_id>/events_*_<app_id>;
    # classic layout: <dir>/<app_id>(.inprogress)?
    cands = [p for p in os.listdir(evdir) if app_id in p]
    if not cands:
        print(f"no event log under {evdir}", file=sys.stderr)
        return 1
    path = os.path.join(evdir, cands[0])
    if os.path.isdir(path):
        parts = sorted(
            p
            for p in os.listdir(path)
            if p.startswith("events_") or p.startswith("eventLog")
        )
        parsed = {"jobs": {}, "stages": {}, "stage_of_job": {}}
        for part in parts:
            sub = parse_eventlog(os.path.join(path, part))
            parsed["jobs"].update(sub["jobs"])
            for sid, st in sub["stages"].items():
                parsed["stages"][sid] = st
            parsed["stage_of_job"].update(sub["stage_of_job"])
    else:
        parsed = parse_eventlog(path)
    out_rows = []
    for name in names:
        jids = [
            j
            for j, jd in parsed["jobs"].items()
            if jd["desc"] == f"Q::{name}"
        ]
        agg = {
            "query": name,
            "wall_sec": walls[name],
            "n_jobs": len(jids),
            "n_stages": 0,
            "task_time_sec": 0.0,
            "gc_sec": 0.0,
            "shuffle_read_mb": 0.0,
            "shuffle_write_mb": 0.0,
            "fetch_wait_sec": 0.0,
            "input_mb": 0.0,
            "spill_mb": 0.0,
            "stages": [],
        }
        for jid in jids:
            for sid in parsed["jobs"][jid]["stages"]:
                st = parsed["stages"].get(sid)
                if st is None:
                    continue  # skipped stage (reused exchange)
                agg["n_stages"] += 1
                tms = st["task_ms"]
                agg["task_time_sec"] += sum(tms) / 1000
                agg["gc_sec"] += st["gc_ms"] / 1000
                agg["shuffle_read_mb"] += st["shuffle_read_b"] / 1e6
                agg["shuffle_write_mb"] += st["shuffle_write_b"] / 1e6
                agg["fetch_wait_sec"] += st["fetch_wait_ms"] / 1000
                agg["input_mb"] += st["input_b"] / 1e6
                agg["spill_mb"] += st["spill_b"] / 1e6
                agg["stages"].append(
                    {
                        "stage": sid,
                        "n_tasks": st["n_tasks"],
                        "sum_ms": sum(tms),
                        "max_ms": max(tms) if tms else 0,
                        "med_ms": _median(tms),
                        "sr_mb": round(st["shuffle_read_b"] / 1e6, 2),
                        "sw_mb": round(st["shuffle_write_b"] / 1e6, 2),
                        "in_mb": round(st["input_b"] / 1e6, 2),
                    }
                )
        for k in (
            "task_time_sec",
            "gc_sec",
            "shuffle_read_mb",
            "shuffle_write_mb",
            "fetch_wait_sec",
            "input_mb",
            "spill_mb",
        ):
            agg[k] = round(agg[k], 3)
        out_rows.append(agg)
        print(json.dumps(agg))
    # human summary to stderr
    print(
        f"{'query':42s} {'wall':>7s} {'jobs':>4s} {'stg':>3s} "
        f"{'task_s':>7s} {'shR_mb':>7s} {'shW_mb':>7s} {'in_mb':>7s}",
        file=sys.stderr,
    )
    for r in sorted(out_rows, key=lambda r: -r["wall_sec"]):
        print(
            f"{r['query']:42s} {r['wall_sec']:7.3f} {r['n_jobs']:4d} "
            f"{r['n_stages']:3d} {r['task_time_sec']:7.2f} "
            f"{r['shuffle_read_mb']:7.1f} {r['shuffle_write_mb']:7.1f} "
            f"{r['input_mb']:7.1f}",
            file=sys.stderr,
        )
    shutil.rmtree(evdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
