"""Per-query bench regression gate.

Compares two bench results (either a raw bench.py JSON line or a
driver-written BENCH_r{N}.json with a ``parsed`` field) and flags any
headline query that got more than ``THRESHOLD``× slower. Exits 1 on
regression (or when the new result is unparseable — a crashed bench is
the worst regression of all, as round 2 proved), so this can gate CI.

Usage:
    python tools/bench_regress.py NEW.json [OLD.json]

With no OLD given, the newest rc==0 BENCH_r*.json in the repo root is
used as the reference. Queries present on only one side are reported
but don't fail the gate (headline sets may grow between rounds).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

THRESHOLD = 1.3  # flag a query slower than 1.3x its reference timing
MIN_SECONDS = 0.2  # ignore ratio noise below this absolute timing

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path: str) -> dict | None:
    """Extract {'value': float, 'queries': {...}} from either format."""
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:  # raw bench.py line
        return doc
    return doc.get("parsed")  # driver BENCH_r{N}.json (None if crashed)


def latest_good_reference(exclude: str) -> str | None:
    cands = sorted(
        glob.glob(os.path.join(_REPO_ROOT, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
        reverse=True,
    )
    for p in cands:
        if os.path.abspath(p) == os.path.abspath(exclude):
            continue
        doc = load(p)
        # A bench with per-query errors is not a clean reference: its
        # errored queries are missing from "queries" (so regressions in
        # them would print as only-one-side and pass) and its total is
        # deflated.
        if doc is not None and not doc.get("errors"):
            return p
    return None


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    new_path = sys.argv[1]
    new = load(new_path)
    if new is None:
        print(f"FAIL {new_path}: bench produced no parseable result (crash?)")
        return 1
    if new.get("errors"):
        print(f"FAIL {new_path}: bench recorded per-query errors: "
              f"{sorted(new['errors'])}")
        return 1
    old_path = sys.argv[2] if len(sys.argv) > 2 else latest_good_reference(new_path)
    if old_path is None:
        print("no reference bench found; nothing to compare")
        return 0
    old = load(old_path)
    if old is None:
        print(f"reference {old_path} unparseable; nothing to compare")
        return 0

    # Prefer NOISE-NORMALIZED timings when both artifacts carry them
    # (bench.py emits queries_normalized since round 11): a slower or
    # contended driver box then reads as noise_index > 1 instead of as
    # a phantom regression — the round-10 +17%/2.54x adjudication,
    # computable from the artifacts alone.
    normalized = bool(
        old.get("queries_normalized") and new.get("queries_normalized")
    )
    if normalized:
        old = {
            **old,
            "queries": old["queries_normalized"],
            "value": old.get("value_normalized", old["value"]),
        }
        new = {
            **new,
            "queries": new["queries_normalized"],
            "value": new.get("value_normalized", new["value"]),
        }
        idx_o = (old.get("noise_probe") or {}).get("noise_index")
        idx_n = (new.get("noise_probe") or {}).get("noise_index")
        print(f"comparing NORMALIZED timings (noise index: "
              f"ref {idx_o}, new {idx_n})")
    print(f"reference: {old_path}  (total {old['value']}s)")
    print(f"new:       {new_path}  (total {new['value']}s)")
    print(f"{'query':<34} {'old':>8} {'new':>8} {'ratio':>7}")
    regressions = []
    for q in sorted(set(old["queries"]) | set(new["queries"])):
        o, n = old["queries"].get(q), new["queries"].get(q)
        if o is None or n is None:
            # explicit None checks: a legitimate 0.0 timing is present,
            # not missing
            o_s = "-" if o is None else f"{o:.3f}"
            n_s = "-" if n is None else f"{n:.3f}"
            print(f"{q:<34} {o_s:>8} {n_s:>8}    only-one-side")
            continue
        ratio = n / o if o else float("inf")
        flag = ""
        if ratio > THRESHOLD and n > MIN_SECONDS:
            flag = "  << REGRESSION"
            regressions.append((q, o, n, ratio))
        print(f"{q:<34} {o:>8.3f} {n:>8.3f} {ratio:>6.2f}x{flag}")
    total_ratio = new["value"] / old["value"] if old["value"] else float("inf")
    print(f"{'TOTAL':<34} {old['value']:>8.3f} {new['value']:>8.3f} "
          f"{total_ratio:>6.2f}x")
    if regressions:
        print(f"\n{len(regressions)} per-query regression(s) > {THRESHOLD}x")
        return 1
    print("\nno regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
