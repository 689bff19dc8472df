"""Watermarked stream-stream interval join — two live streams, bounded state.

The reference joins a stream against STATIC or slowly-refreshing side
inputs (J1–J5, PubSub→lookup in MediationService.scala); joining two
LIVE streams is the capability that family stops short of (Beam would
need CoGroupByKey over windows). Spark's stream-stream join is the
native form: both sides buffer in the state store, and the
watermark + time-range condition tells Spark exactly when a buffered
row can never match again and is evicted.

``interval_stream_join`` pins the scalable contract:

- Equi-key + BOUNDED time range (``right.ts ∈ [left.ts + lower,
  left.ts + upper]``). The equi-key carries the shuffle — both
  streams hash-partition on it, so matching is per-key-group local.
  The range bound + watermark makes state eviction provable: a left
  row older than ``watermark − upper`` (resp. right older than
  ``watermark``) is dropped. Without the range condition state grows
  forever — this operator refuses to build such a join.
- INNER join: every qualifying pair is emitted exactly once, as soon
  as both sides have arrived — the result is micro-batch-boundary
  independent and equals the batch join of the full inputs (pinned in
  tests/test_stream_join.py). Outer variants additionally emit
  null-padded rows only once the watermark PASSES a row's last
  possible match time; that timing is correct but inherently
  watermark-paced, so the equality pin is on the inner form.

At 100 TB: state per partition is the last ``upper − lower`` window
of both streams for that key range — time-bounded, not
volume-bounded; the join itself is one hash exchange per side, the
same shape as the batch equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    watermark_s: int,
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where ``right_ts`` falls within
    ``[left_ts + lower_s, left_ts + upper_s]`` seconds.

    Both sides get a ``watermark_s``-second watermark on their time
    column (the lateness budget shared by eviction and — for outer
    joins — null emission). Column names must be disjoint except
    ``key``; the output carries ``key`` once plus both sides' other
    columns.
    """
    if lower_s > upper_s:
        raise ValueError(f"empty interval: [{lower_s}, {upper_s}]")
    if how not in ("inner", "leftOuter", "rightOuter", "fullOuter"):
        raise ValueError(f"unsupported join type: {how}")
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"ambiguous columns {sorted(overlap)}: alias one side first"
        )
    lw = left.withWatermark(left_ts, f"{watermark_s} seconds")
    rw = right.withWatermark(right_ts, f"{watermark_s} seconds")
    cond = (
        (lw[key] == rw[key])
        & (
            rw[right_ts]
            >= lw[left_ts] + F.expr(f"INTERVAL {lower_s} SECONDS")
        )
        & (
            rw[right_ts]
            <= lw[left_ts] + F.expr(f"INTERVAL {upper_s} SECONDS")
        )
    )
    joined = lw.join(rw, cond, how)
    # one key column out, not two (outer joins need the coalesce)
    return joined.select(
        F.coalesce(lw[key], rw[key]).alias(key),
        *[lw[c] for c in left.columns if c != key],
        *[rw[c] for c in right.columns if c != key],
    )


def absence_detect_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within_s: int,
    watermark_s: int,
) -> DataFrame:
    """Left rows with NO right match within ``within_s`` seconds —
    the conversion-timeout / missing-follow-up detector (views that
    never purchased, requests that never acked).

    Built on the leftOuter interval join: Spark emits the null-padded
    row for a left row ONLY once the watermark passes its last
    possible match time (left_ts + within_s + lateness budget), so an
    absence is a PROVEN absence, not a not-yet. The emission is
    therefore watermark-paced by construction — batch equivalence
    holds on the row SET once the watermark has passed every left
    row's horizon (pinned in tests/test_stream_join.py), while
    emission TIME depends on stream progress, which no batch twin can
    express. State stays time-bounded exactly as the inner form.
    """
    j = interval_stream_join(
        left,
        right,
        key=key,
        left_ts=left_ts,
        right_ts=right_ts,
        lower_s=0,
        upper_s=within_s,
        watermark_s=watermark_s,
        how="leftOuter",
    )
    return j.filter(F.col(right_ts).isNull()).select(
        key, *[c for c in left.columns if c != key]
    )
