"""Plan-stability snapshots (Spark PlanStabilitySuite practice): the
headline queries' physical strategy — join algorithms, exchange kinds,
aggregate shapes — is pinned in tests/plan_snapshots.json. A change
that flips a broadcast join to a sort-merge join or inserts an extra
shuffle fails HERE even though correctness and the anti-pattern audit
both still pass. Regenerate deliberately with
`python tools/plan_snapshot.py --update` and review the diff."""

from __future__ import annotations

import json
import os
import sys

_TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)
if _TOOLS not in sys.path:
    sys.path.insert(0, _TOOLS)


def test_headline_plans_match_snapshots(spark):
    from plan_snapshot import SNAPSHOT_PATH, build

    with open(SNAPSHOT_PATH) as f:
        pinned = json.load(f)
    current = build(spark)
    drifted = {
        name: {"pinned": pinned.get(name), "current": sig}
        for name, sig in current.items()
        if pinned.get(name) != sig
    }
    assert not drifted, json.dumps(drifted, indent=1)
