"""Driver-gate simulator: reproduce the round-9 OOM conditions.

Emulates the driver's correctness harness as closely as the repo can
observe it: ONE Python process holding a DuckDB connection (default
memory_limit = 80% of total RAM) plus a co-resident big-heap Spark JVM,
running the first-50 window of ``__spark_entry__.queries()`` in
insertion order, interleaving [Spark query -> toPandas] with
[DuckDB oracle -> fetchdf] per row, exactly the shape whose round-9
artifact showed 24 contiguous "Failed to allocate block" oracle errors
(CORRECTNESS_r09.json rows 11-34; adjudicated environmental in
VERDICT.md).

Per row it records the lever this round adds (plans/hygiene.py via
__spark_entry__._with_hygiene): JVM RSS, Python RSS, system
MemAvailable, and the oracle outcome. Run with HYGIENE=0 to measure
the unmitigated footprint curve.

Usage:
    python tools/driver_sim.py [sf_dir] [n_window]
    HYGIENE=0 python tools/driver_sim.py      # disable the hook
    DRIVER_SIM_HEAP=64g python tools/driver_sim.py

Emits one JSON line per row to stdout and a summary JSON to
BENCH_LOCAL_r10_driver_sim.json when SIM_OUT is set.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from scio_db_spark.plans.catalog import TABLES


def _rss_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return -1


def _mem_available_kb() -> int:
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("MemAvailable:"):
                return int(line.split()[1])
    return -1


def _jvm_pid() -> int:
    """The Spark driver JVM is this process's java child."""
    me = os.getpid()
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().split()
            if int(parts[3]) == me and "java" in parts[1]:
                return int(pid)
        except (OSError, IndexError, ValueError):
            continue
    return -1


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_window = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    hygiene = os.environ.get("HYGIENE", "1") != "0"
    heap = os.environ.get("DRIVER_SIM_HEAP", "64g")

    # Big heap mimics a driver conf sized for the whole box; without
    # per-query full GCs G1 balloons its committed heap across the
    # window and never gives it back.
    from scio_db_spark.session import SessionFactory

    spark = SessionFactory.create(
        "driver-sim", extra_conf={"spark.driver.memory": heap}
    )
    import __spark_entry__ as entry

    if not hygiene:
        # Bypass the _with_hygiene wrapper: raw registry callables.
        from scio_db_spark.plans.registry import all_queries

        regs = all_queries()
        qmap = {
            entry._driver_key(n): s.spark
            for n, s in sorted(
                regs.items(), key=lambda kv: entry._driver_key(kv[0])
            )
        }
        omap = {
            entry._driver_key(n): s.oracle
            for n, s in regs.items()
            if s.oracle is not None
        }
    else:
        qmap = entry.queries()
        omap = entry.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    jpid = _jvm_pid()
    rows = []
    window = list(qmap)[:n_window]
    t_all = time.time()
    for i, name in enumerate(window):
        rec = {"i": i, "q": name}
        t0 = time.time()
        try:
            spark_pd = qmap[name](spark, sf_dir).toPandas()
            rec["spark_rows"] = len(spark_pd)
        except Exception as e:  # noqa: BLE001
            rec["spark_err"] = str(e)[:200]
        rec["t_spark"] = round(time.time() - t0, 2)
        t1 = time.time()
        if name in omap:
            try:
                duck_pd = con.execute(omap[name]).fetchdf()
                rec["oracle_rows"] = len(duck_pd)
            except Exception as e:  # noqa: BLE001
                rec["oracle_err"] = str(e)[:200]
        rec["t_oracle"] = round(time.time() - t1, 2)
        rec["jvm_rss_mb"] = _rss_kb(jpid) // 1024
        rec["py_rss_mb"] = _rss_kb(os.getpid()) // 1024
        rec["avail_mb"] = _mem_available_kb() // 1024
        print(json.dumps(rec), flush=True)
        rows.append(rec)

    summary = {
        "metric": "driver_sim",
        "hygiene": hygiene,
        "heap": heap,
        "sf_dir": sf_dir,
        "n": len(rows),
        "oracle_errs": sum(1 for r in rows if "oracle_err" in r),
        "spark_errs": sum(1 for r in rows if "spark_err" in r),
        "jvm_rss_mb_max": max(r["jvm_rss_mb"] for r in rows),
        "jvm_rss_mb_final": rows[-1]["jvm_rss_mb"],
        "avail_mb_min": min(r["avail_mb"] for r in rows),
        "wall_sec": round(time.time() - t_all, 1),
    }
    print(json.dumps(summary), flush=True)
    out = os.environ.get("SIM_OUT")
    if out:
        mode = "hygiene" if hygiene else "raw"
        try:
            with open(out) as f:
                payload = json.load(f)
        except (OSError, ValueError):
            payload = {}
        payload[mode] = summary
        payload.setdefault("rows", {})[mode] = rows
        with open(out, "w") as f:
            json.dump(payload, f, indent=1)
    spark.stop()
    return 1 if summary["oracle_errs"] or summary["spark_errs"] else 0


if __name__ == "__main__":
    sys.exit(main())
