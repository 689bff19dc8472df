"""Incremental aggregate maintenance: merge partial states, never rescan.

At 100 TB the expensive thing is not the aggregation — it's reading
the base data again. Counts and exact-integer sums form a commutative
monoid, so a stored aggregate STATE and a new batch's state merge by
key in time proportional to |state| + |batch|, independent of how
much history produced the state. This module is that merge path: the
batch twin of what the reference's stateful mediation accumulates
per key incrementally (MediationService.scala keyed state), and the
materialized-view-maintenance shape every warehouse needs.

Distributed shape:

- ``agg_state`` is a plain hash aggregation (map-side partials, one
  shuffle on the key).
- ``merge_states`` is union → the SAME hash aggregation over the
  concatenated states: sums of sums, sums of counts. One shuffle of
  |state_a| + |state_b| rows; the base data is never touched.
- Correctness is checkable by construction: merge(state(A), state(B))
  must equal state(A ∪ B) exactly — which is why measures are
  restricted to counts and integer/decimal sums (doubles would make
  the equality float-ordering-dependent; quantize first).

avg/stddev extend the same way by carrying (n, sum, sum_sq) triples;
min/max merge trivially; true medians/distincts need sketches (see
docs_token_hll_estimate for the approx-distinct form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: dict,
    count_col: str = "n",
) -> DataFrame:
    """Mergeable aggregate state: per-key count + exact sums.

    ``sum_cols`` maps output name -> exact-integer/decimal Column.
    """
    return df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(col).alias(name) for name, col in sum_cols.items()],
    )


def merge_states(
    states: list[DataFrame],
    key_cols: list[str],
    measure_cols: list[str],
) -> DataFrame:
    """Merge per-key states: one union + one re-aggregation by key."""
    if not states:
        raise ValueError(
            "merge_states needs at least one state DataFrame; an empty "
            "batch window should contribute an EMPTY state, not none"
        )
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*key_cols).agg(
        *[F.sum(c).alias(c) for c in measure_cols]
    )
