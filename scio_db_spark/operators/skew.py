"""Skew mitigation: salted two-phase aggregation (SURVEY.md scale note).

AQE's skew-join splitting handles skewed JOINs at runtime; skewed
AGGREGATIONS (one hot key receiving most rows — the null-key flood, the
celebrity user) still funnel one reducer. The classic fix is salting:
phase 1 aggregates on (key, salt) spreading the hot key over N
reducers, phase 2 merges the partials on the key alone. Only algebraic
aggregates decompose this way; this module implements the standard
four (+avg via sum/count) with the merge laws applied automatically.

The salt is a DETERMINISTIC content hash (xxhash64 over the row,
mod n_salts) — NOT rand(): a nondeterministic salt plus task retries
can re-shuffle rows into different phase-1 groups mid-job and corrupt
the phase-2 merge (the SPARK-23207 class). A content hash spreads a
hot key just as well (its non-key columns vary) while every retry
recomputes the same salt; the merged result is salt-independent
either way (property-tested against the unsalted plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

#: agg kind → (phase-1 partial, phase-2 merge)
_MERGE_LAWS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
    # collect_list is mergeable by concatenation (flatten of the
    # per-salt lists). NOTE: element order is partition-dependent in
    # the plain form already, so the salted form is no less
    # deterministic — callers needing order must sort afterwards.
    # This is the kind where salting actually PAYS: sum/count/min/max
    # collapse map-side (partial aggregation absorbs a hot key before
    # the shuffle), but a hot key's list rows all cross the exchange
    # into one reducer — see tools/bench_skew.py for the measurement.
    "collect_list": (
        F.collect_list,
        lambda c: F.flatten(F.collect_list(c)),
    ),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name → (kind, column) with kind in
    {sum, count, min, max, avg, collect_list}. ``collect_list``
    flattens the per-salt lists in phase 2; element order is
    NONDETERMINISTIC across salts (same caveat as unsalted
    collect_list across partitions) — sort downstream if order
    matters. Example::

        salted_agg(df, ["user_id"], {
            "n": ("count", F.lit(1)),
            "total": ("sum", "value"),
            "biggest": ("max", "value"),
            "mean": ("avg", "value"),
            "payloads": ("collect_list", "value"),
        }, n_salts=32)
    """
    phase1_cols: list[Column] = []
    phase2_cols: list[Column] = []
    post_cols: list[Column] = []

    for name, (kind, col) in aggs.items():
        col = F.col(col) if isinstance(col, str) else col
        if kind == "avg":
            # avg is not algebraic — decompose into sum + count.
            phase1_cols.append(F.sum(col).alias(f"__{name}_s"))
            phase1_cols.append(F.count(col).alias(f"__{name}_c"))
            phase2_cols.append(F.sum(f"__{name}_s").alias(f"__{name}_s"))
            phase2_cols.append(F.sum(f"__{name}_c").alias(f"__{name}_c"))
            post_cols.append(
                (F.col(f"__{name}_s") / F.col(f"__{name}_c")).alias(name)
            )
            continue
        if kind not in _MERGE_LAWS:
            raise ValueError(
                f"unsupported agg kind {kind!r}; algebraic kinds only "
                f"({sorted(_MERGE_LAWS)} + avg)"
            )
        partial, merge = _MERGE_LAWS[kind]
        phase1_cols.append(partial(col).alias(name))
        phase2_cols.append(merge(name).alias(name))
        post_cols.append(F.col(name))

    # Deterministic row-content salt, NOT rand(): a recomputed task
    # (executor loss) must route every row to the SAME reducer as the
    # lost attempt, or phase-2 merges a mix of old and new partials —
    # the SPARK-23207 silent-corruption class. Content-hashing keeps
    # retries idempotent; fully duplicate rows share a salt, which only
    # costs balance, never correctness.
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*df.columns), F.lit(n_salts)).cast("int")
    )
    merged = (
        salted.groupBy(*keys, _SALT)
        .agg(*phase1_cols)
        .groupBy(*keys)
        .agg(*phase2_cols)
    )
    return merged.select(*[F.col(k) for k in keys], *post_cols)


def salted_join_key(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Manual salted equi-join prep (for engines/paths without AQE):
    the skewed LEFT side gets a random salt, the small RIGHT side is
    exploded ×n_salts so every salted key finds its match. Returns
    (left', right', join_cols). Prefer AQE skew-join where available —
    this is the explicit fallback the operators compose with.
    """
    # Deterministic for the same retry-idempotence reason as salted_agg.
    lsalted = left.withColumn(
        _SALT, F.pmod(F.xxhash64(*left.columns), F.lit(n_salts)).cast("int")
    )
    rsalted = right.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return lsalted, rsalted, [on, _SALT]
