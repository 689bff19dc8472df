"""Benchmark harness: runs the headline queries and prints ONE JSON line.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default all cores).

Each query is fully materialized via a count-ish action that forces
every column (``df.write.format("noop")``) so the measurement includes
the complete plan, not just the first partition.

Noise normalization (round-10 adjudication, made computable from the
artifact alone): a FIXED reference workload — full parquet scan of
``lineitem`` through a noop write, zero repo code in the hot path —
runs before and after the measured passes. Its best time over a
committed quiet-box reference gives ``noise_index``; the artifact
carries raw seconds, the probe runs, and ``queries_normalized``
(raw / noise_index), so a slower or contended driver box reads as
noise_index > 1 instead of as a phantom regression (BENCH_r10 vs r9:
nominal +17% while the probe ran 2.54× slower — that adjudication
needed the builder's quiet-box re-run; now it's in the JSON).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from scio_db_spark.plans.registry import all_queries  # noqa: E402
from scio_db_spark.session import SessionFactory  # noqa: E402

# Quiet-box reference for the fixed probe at sf0.1: median of
# session-level best-of-4 across 5 idle-box JVMs on the round-11 build
# box (mins 0.31-0.51 s — the probe's own cross-JVM noise floor is
# ~±30%, so treat noise_index in [0.7, 1.4] as "same box, quiet";
# the r10 adjudication gap this exists to catch was 2.54x). Re-pin
# only from a quiet box.
_PROBE_QUIET_REF_SEC = {"0.1": 0.38}


def _noise_probe(spark, sf_dir: str, passes: int = 3) -> list[float]:
    """Fixed-workload probe: full-column scan of the largest table via
    noop write — pure Spark + parquet, no repo code, so its runtime
    moves ONLY with the box (hardware + contention), never with this
    repo's changes."""
    path = os.path.join(sf_dir, "lineitem.parquet")
    runs: list[float] = []
    for _ in range(passes):
        t0 = time.perf_counter()
        spark.read.parquet(path).write.format("noop").mode(
            "overwrite"
        ).save()
        runs.append(round(time.perf_counter() - t0, 4))
    return runs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Loaded-box defense (shared across every lane — tools/benchgate.py):
    # gate BEFORE any Spark work; a box that never quiets still runs
    # but the artifact carries loaded_run=true so it can't silently
    # read as a regression.
    sys.path.insert(0, os.path.join(_REPO_ROOT, "tools"))
    from benchgate import preflight_load_gate

    _gate_stamps = preflight_load_gate("bench")
    spark = SessionFactory.create("bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = {n: s for n, s in sorted(all_queries().items()) if s.headline}
    # Per-query fault isolation: one broken query must never cost the
    # whole round's timing signal (in round 2 a single warm-up crash
    # produced NO bench number at all). Errors are collected into the
    # JSON line's "errors" field; the process still exits ZERO so the
    # recorded line survives — gate on tools/bench_regress.py, which
    # fails when the errors field is present, NOT on this exit code.
    errors: dict[str, str] = {}

    # Warm-up pass: execute every query once (JIT, codegen cache,
    # parquet footers) so the measured pass is steady-state throughput,
    # not first-touch setup. No data is cached — .persist() is never
    # called — so the measured pass still scans parquet end-to-end.
    for name, spec in specs.items():
        try:
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:  # noqa: BLE001 — record, keep benching
            errors[name] = f"{type(e).__name__}: {e}"

    # Best of 3 measured passes per query: single runs on a shared
    # machine are noisy (±40% observed; round 4's driver artifact
    # flagged 3 phantom regressions that re-measured at 0.94-1.01× on
    # an idle box). min-of-N reports the engine's cost, not the
    # scheduler's worst moment; the recorded per-run matrix + loadavg
    # make a loaded run self-diagnosing without a re-run.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    load_start = os.getloadavg()[0]
    probe_pre = _noise_probe(spark, sf_dir)
    wall_start = time.perf_counter()
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name, spec in specs.items():
        if name in errors:
            continue
        best = float("inf")
        try:
            per_run: list[float] = []
            for _ in range(passes):
                t0 = time.perf_counter()
                df = spec.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                per_run.append(round(time.perf_counter() - t0, 4))
                best = min(best, per_run[-1])
            timings[name] = round(best, 4)
            runs[name] = per_run
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"

    probe_post = _noise_probe(spark, sf_dir)
    probe_best = min(probe_pre + probe_post)
    quiet_ref = _PROBE_QUIET_REF_SEC.get(
        sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    )
    noise = round(probe_best / quiet_ref, 4) if quiet_ref else None
    # One-sided dead band: the probe's own cross-JVM jitter is ~±30%,
    # so only a clearly SLOW/contended box (index > 1.4; r10's was
    # 2.54x) triggers rescaling. An index below 1 never does — a
    # fast probe means probe jitter, and dividing by it would inflate
    # every query, manufacturing a phantom regression.
    noise_eff = (noise if noise and noise > 1.4 else 1.0) if (
        noise
    ) else None
    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Scaling-contract visibility (round-12 verdict item 1): the
        # driver re-runs this bench at a reduced core count; emit the
        # EFFECTIVE parallelism so the artifact itself proves the
        # $SPARK_GRAFT_CPUS contract was honored (the r12 driver
        # flagged suspect_cpus_ignored on a bench that did honor it,
        # because nothing in the JSON said so).
        "cores": spark.sparkContext.defaultParallelism,
        "cpus_env": os.environ.get("SPARK_GRAFT_CPUS"),
        "passes": passes,
        "runs": runs,
        # noise-normalization block: raw + normalized + the index, so
        # cross-round comparisons on a slow/contended box
        # self-adjudicate from the artifact alone (round-10 item 6)
        "noise_probe": {
            "runs_pre": probe_pre,
            "runs_post": probe_post,
            "best": probe_best,
            "quiet_ref": quiet_ref,
            "noise_index": noise,
            "noise_index_effective": noise_eff,
        },
        "queries_normalized": (
            {n: round(t / noise_eff, 4) for n, t in timings.items()}
            if noise_eff
            else None
        ),
        "value_normalized": (
            round(total / noise_eff, 4) if noise_eff else None
        ),
        "load_1m": [round(load_start, 2), round(os.getloadavg()[0], 2)],
        # A bench is its OWN load: on local[32] a healthy run drives
        # the 1m load up (warm-up included), so neither the
        # post-warm-up nor the end reading can be gated on. "Loaded"
        # means the box was busy BEFORE any Spark work, post-wait.
        **_gate_stamps,
        "measure_wall_sec": round(time.perf_counter() - wall_start, 2),
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    # Exit 0 even with errors: the recorded JSON line IS the signal and
    # a non-zero rc risks the harness discarding it. The regression
    # gate (tools/bench_regress.py) fails on the "errors" field.
    if errors:
        print(
            f"bench: {len(errors)} queries errored: {sorted(errors)}",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
