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


def retract_merge(
    state: DataFrame,
    retractions: DataFrame,
    additions: DataFrame,
    key_cols: list[str],
    measure_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Apply a change feed to a stored aggregate state WITHOUT touching
    the base data: retractions contribute their measures NEGATED,
    additions contribute them as-is, then one merge by key; groups
    whose count reaches zero are dropped (the group no longer exists
    in the maintained view).

    This is the retraction half the plain merge law can't express —
    deletes and updates in a CDC feed must SUBTRACT the old row's
    contribution before adding the new one. Sound only for
    group-invertible measures (counts, exact-integer sums; avg via
    (n, sum)); min/max are NOT retractable — deleting the current min
    needs a group rescan, so refuse them upstream rather than drift.

    Cost ∝ |state| + |changes|; the base table is never rescanned.
    """
    neg = retractions.select(
        *key_cols,
        *[(-F.col(c)).alias(c) for c in [count_col, *measure_cols]],
    )
    pos = additions.select(
        *key_cols, count_col, *measure_cols
    )
    merged = merge_states(
        [state, neg, pos],
        key_cols=key_cols,
        measure_cols=[count_col, *measure_cols],
    )
    # A negative count means the feed retracted rows the state never
    # held (double-applied deletes, a diff against the wrong base) —
    # silently keeping or dropping the group would drift the view;
    # refuse loudly instead (assert_true is NULL on success, so the
    # coalesce leaves the count unchanged).
    guard = F.coalesce(
        F.assert_true(
            F.col(count_col) >= 0,
            F.lit(
                "retract_merge: negative group count — the change "
                "feed retracts rows the state does not hold "
                "(operators/incremental.py)"
            ),
        ).cast("long"),
        F.lit(0),
    )
    merged = merged.withColumn(count_col, F.col(count_col) + guard)
    return merged.filter(F.col(count_col) != 0)


def delta_join(
    a_old: DataFrame,
    d_a: DataFrame,
    b_old: DataFrame,
    d_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Delta of an inner-join view under inserts on BOTH sides:

        Δ(A ⋈ B) = (dA ⋈ B_old) ∪ (A_new ⋈ dB),   A_new = A_old ∪ dA

    so V_new = V_old ∪ Δ — the materialized join is maintained by two
    joins sized by the DELTAS (each join has a delta on one side),
    never by recomputing A_old ⋈ B_old. The dA ⋈ dB cross-delta pairs
    are covered exactly once: they appear in the A_new ⋈ dB term and
    are excluded from dA ⋈ B_old because B_old excludes dB. Classic
    incremental view maintenance (counting/delta rules, e.g.
    Gupta & Mumick's survey); insert-only here — deletes compose via
    retract_merge on the downstream aggregate instead of row removal.
    """
    a_new = a_old.unionByName(d_a)
    return d_a.join(b_old, on).unionByName(a_new.join(d_b, on))
