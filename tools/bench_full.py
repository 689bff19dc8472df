"""Slow-lane bench: time EVERY registry query, not just the headline set.

bench.py covers the 19 headline queries; regressions in the other
~120 only surfaced when a judge or builder happened to look. This
lane times the full registry (min-of-N per query, loadavg recorded)
and, given a previous artifact, prints a regression report so a
non-headline slowdown is caught the round it happens.

Usage:
    python tools/bench_full.py [sf_dir] [--passes N] [--out FILE]
    python tools/bench_full.py --compare OLD.json NEW.json [--ratio R]

Effectful queries (maintenance censuses that stage table copies) are
skipped — their cost is dominated by the staged side effects, and
building them repeatedly mutates scratch state.

One JSON line on stdout (or FILE): {"metric": "full_registry_total",
"value": sec, "queries": {...}, "sf": ..., "passes": N, "load_1m": [..]}.
Compare mode exits 1 when any query regressed by more than --ratio
(default 1.5x — the box's run-to-run noise band is wide; see
BENCH_LOCAL_r05 notes) AND by more than 0.3s absolute.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def compare(old_path: str, new_path: str, ratio: float, abs_floor: float
            ) -> int:
    with open(old_path) as f:
        old = json.load(f)["queries"]
    with open(new_path) as f:
        new = json.load(f)["queries"]
    regressed = []
    for name, t_new in sorted(new.items()):
        t_old = old.get(name)
        if t_old is None:
            continue
        if t_new > t_old * ratio and t_new - t_old > abs_floor:
            regressed.append((name, t_old, t_new))
    for name, t_old, t_new in regressed:
        print(f"REGRESS {name}: {t_old:.3f}s -> {t_new:.3f}s "
              f"({t_new / t_old:.2f}x)")
    gone = sorted(set(old) - set(new))
    added = sorted(set(new) - set(old))
    if gone:
        print(f"dropped from registry: {gone}")
    if added:
        print(f"new queries (no baseline): {added}")
    if not regressed:
        print(f"no regressions beyond {ratio}x+{abs_floor}s "
              f"on {len(set(old) & set(new))} shared queries")
    return 1 if regressed else 0


def main() -> int:
    if "--compare" in sys.argv:
        i = sys.argv.index("--compare")
        ratio = (
            float(sys.argv[sys.argv.index("--ratio") + 1])
            if "--ratio" in sys.argv
            else 1.5
        )
        return compare(sys.argv[i + 1], sys.argv[i + 2], ratio, 0.3)

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = pos[0] if pos else "/root/testdata/sf0.01"
    passes = (
        int(sys.argv[sys.argv.index("--passes") + 1])
        if "--passes" in sys.argv
        else 2
    )
    out_path = (
        sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else None
    )

    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.session import SessionFactory
    from benchgate import preflight_load_gate

    _gate_stamps = preflight_load_gate("bench_full")
    spark = SessionFactory.create("bench-full")
    spark.sparkContext.setLogLevel("ERROR")

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0)
    times: dict[str, float] = {}
    skipped = []
    for name, spec in sorted(all_queries().items()):
        if spec.effectful:
            skipped.append(name)
            continue
        best = float("inf")
        for _ in range(passes):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 4)
        print(f"{name}: {times[name]}", file=sys.stderr)

    out = {
        "metric": "full_registry_total",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "passes": passes,
        "n_queries": len(times),
        "skipped_effectful": skipped,
        "load_1m": list(os.getloadavg())[:2],
        **_gate_stamps,
    }
    line = json.dumps(out)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
