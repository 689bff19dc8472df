"""Determinism-under-load loop for the registry (round-9 verdict #6).

The round-9 judge sweep flagged `events_top_paths` ONCE while pytest
saturated the box (6/6 green after, including a quiet full sweep) —
adjudicated as judge-harness contention, but unproven. This tool
retires the question with evidence:

1. **Spot loop**: K seed-chosen registry queries, each executed N
   times while a background load generator keeps the SAME driver
   saturated (4 threads cycling shuffle-heavy registry queries —
   Spark schedules concurrent jobs in one session, the contention
   shape the flake hypothesis names). Every repeat must produce the
   identical order-insensitive value hash.
2. **Full double-run**: every registry query hashed twice
   back-to-back (no induced load); any drift is a real
   nondeterminism bug with a named repro.

Usage:
    python tools/determinism_check.py [sf_dir] [--k 12] [--n 3]
        [--seed 10] [--skip-full] [--out FILE]

Exit 1 on any hash drift; one JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import random
import sys
import threading
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from check_oracle import value_hash  # noqa: E402

# shuffle-heavy load mix: joins, windows, explodes — the shapes that
# compete for shuffle/memory with the query under test
_LOAD_MIX = [
    "q05_region_revenue",
    "events_session_windows",
    "docs_minhash_signature",
    "basket_part_pairs_topk",
]


def _arg(flag: str, default):
    if flag in sys.argv:
        return type(default)(sys.argv[sys.argv.index(flag) + 1])
    return default


def main() -> int:
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1 and not sys.argv[1].startswith("--")
        else "/root/testdata/sf0.01"
    )
    k = _arg("--k", 12)
    n = _arg("--n", 3)
    seed = _arg("--seed", 10)
    out_path = _arg("--out", "")
    skip_full = "--skip-full" in sys.argv

    from scio_db_spark.plans.registry import all_queries
    from scio_db_spark.session import SessionFactory

    spark = SessionFactory.create("determinism-check")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()

    rng = random.Random(seed)
    # always include the one historical flake, then seed-sample
    chosen = ["events_top_paths"] + rng.sample(
        sorted(x for x in q if x != "events_top_paths"), k - 1
    )

    stop = threading.Event()
    load_errors: list[str] = []

    def _load_worker(name: str) -> None:
        while not stop.is_set():
            try:
                q[name].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as e:  # noqa: BLE001 — recorded, not fatal
                load_errors.append(f"{name}: {e}")
                return

    threads = [
        threading.Thread(target=_load_worker, args=(m,), daemon=True)
        for m in _LOAD_MIX
    ]
    for t in threads:
        t.start()

    drift: dict[str, list[str]] = {}
    t0 = time.time()
    for name in chosen:
        hashes = []
        for _ in range(n):
            pdf = q[name].spark(spark, sf_dir).toPandas()
            hashes.append(value_hash(pdf))
        if len(set(hashes)) != 1:
            drift[name] = hashes
        print(
            f"loaded x{n} {name}: "
            f"{'DRIFT ' + str(hashes) if name in drift else 'stable'}",
            file=sys.stderr,
        )
    loaded_wall = round(time.time() - t0, 1)
    stop.set()
    for t in threads:
        t.join(timeout=120)

    full_drift: dict[str, list[str]] = {}
    full_wall = None
    if not skip_full:
        t0 = time.time()
        first = {
            name: value_hash(spec.spark(spark, sf_dir).toPandas())
            for name, spec in sorted(q.items())
        }
        for name, spec in sorted(q.items()):
            h2 = value_hash(spec.spark(spark, sf_dir).toPandas())
            if h2 != first[name]:
                full_drift[name] = [first[name], h2]
        full_wall = round(time.time() - t0, 1)

    result = {
        "metric": "determinism_check",
        "sf_dir": sf_dir,
        "seed": seed,
        "loaded": {
            "k": len(chosen),
            "n": n,
            "queries": chosen,
            "drift": drift,
            "load_mix": _LOAD_MIX,
            "load_errors": load_errors[:5],
            "wall_sec": loaded_wall,
        },
        "full_double_run": (
            None
            if skip_full
            else {
                "n_queries": len(q),
                "drift": full_drift,
                "wall_sec": full_wall,
            }
        ),
    }
    line = json.dumps(result)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    return 1 if drift or full_drift else 0


if __name__ == "__main__":
    sys.exit(main())
