"""Data-quality operators: column profiling + referential integrity.

The Deequ/great-expectations-style audit surface a pipeline engine
needs before trusting a feed: per-column completeness/cardinality
profiles and parent↔child key-integrity censuses. Both are exact
(integer counts only — no min/max value rendering, whose string
formatting diverges between engines) and oracle-checked via
``dq_profile_orders`` / ``dq_referential_orders_lineitem``.

Scale shapes:

- ``profile``: ONE scan. Spark plans the N ``count(distinct col)``
  aggregates as a single pass through an Expand (each input row fans
  to N+1 grouping rows map-side, then one exchange of partial
  aggregates) — the standard one-job profiling trade: N separate
  jobs would scan N times, Expand scans once at N× map-side rows,
  cheap because the fan-out happens before any shuffle and partials
  collapse per column. The unpivot to one row per column touches an
  N-row frame.
- ``referential_census``: child keys are COUNT-REDUCED per fk before
  any join (bounded by |distinct keys|, not child volume), parent
  keys are distinct-reduced; one full-outer equi-join of the two
  reduced frames, then a scalar census (map-side partial counts
  cross the final exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct,
    is_unique). ``n_distinct`` counts distinct NON-NULL values;
    ``is_unique`` = every non-null value occurs exactly once (key
    candidate)."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("profile() needs at least one column")
    # Internal aliases are INDEX-based and the unpivot is the
    # Column-form F.stack with the user-facing name as a literal —
    # never interpolated into SQL text — so arbitrary column names
    # ("order id", "isn't", backslashes) can neither break parsing
    # nor inject expression text. df[c] looks the column up verbatim
    # (F.col would parse dots/backticks).
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(df[c]).alias(f"__nn_{i}"))
        aggs.append(F.countDistinct(df[c]).alias(f"__nd_{i}"))
    one = df.agg(*aggs)
    stack_cols: list = []
    for i, c in enumerate(cols):
        stack_cols += [F.lit(c), F.col(f"__nn_{i}"), F.col(f"__nd_{i}")]
    return one.select(
        F.col("__n").alias("n_rows"),
        F.stack(F.lit(len(cols)), *stack_cols).alias(
            "column", "n_non_null", "n_distinct"
        ),
    ).select(
        "column",
        "n_rows",
        (F.col("n_rows") - F.col("n_non_null")).alias("n_null"),
        "n_distinct",
        (
            (F.col("n_distinct") == F.col("n_non_null"))
            & (F.col("n_non_null") > 0)
        ).alias("is_unique"),
    )


def referential_census(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """One-row integrity census of a child→parent foreign key:
    (n_child_rows, n_orphan_rows, n_orphan_keys, n_parents,
    n_childless_parents)."""
    ck = (
        child.groupBy(F.col(child_key).alias("__k"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    pk = parent.select(F.col(parent_key).alias("__p")).distinct()
    j = ck.join(pk, ck["__k"] == pk["__p"], "full_outer")
    orphan = F.col("__p").isNull() & F.col("__k").isNotNull()
    childless = F.col("__k").isNull() & F.col("__p").isNotNull()
    # every count coalesced: agg over the empty join (both frames
    # empty) must report zeros, never NULLs — integer counts only.
    return j.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("n_child_rows"),
        F.coalesce(
            F.sum(F.when(orphan, F.col("__c")).otherwise(0)), F.lit(0)
        ).alias("n_orphan_rows"),
        F.coalesce(
            F.sum(F.when(orphan, 1).otherwise(0)), F.lit(0)
        ).alias("n_orphan_keys"),
        F.coalesce(
            F.sum(F.when(F.col("__p").isNotNull(), 1).otherwise(0)),
            F.lit(0),
        ).alias("n_parents"),
        F.coalesce(
            F.sum(F.when(childless, 1).otherwise(0)), F.lit(0)
        ).alias("n_childless_parents"),
    )


def constraint_census(
    df: DataFrame, constraints: dict[str, "F.Column"]
) -> DataFrame:
    """One row per named boolean constraint: (constraint, n_rows,
    n_pass, n_fail, n_unknown) — unknown = the predicate evaluated to
    NULL (three-valued logic surfaced, not silently folded into
    fail). ONE scan: all constraints aggregate in a single pass, then
    an unpivot over the |constraints|-row frame."""
    names = list(constraints)
    if not names:
        raise ValueError("constraint_census() needs at least one check")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, (name, pred) in enumerate(constraints.items()):
        aggs.append(
            F.sum(F.when(pred, 1).otherwise(0)).alias(f"__p_{i}")
        )
        aggs.append(
            F.sum(F.when(~pred, 1).otherwise(0)).alias(f"__f_{i}")
        )
    one = df.agg(*aggs)
    # Column-form F.stack: names are free-form dict keys and ride as
    # literal Columns, never interpolated into SQL text (quote
    # doubling alone still mangled backslashes — verified live).
    stack_cols: list = []
    for i, name in enumerate(names):
        stack_cols += [F.lit(name), F.col(f"__p_{i}"), F.col(f"__f_{i}")]
    return one.select(
        F.col("__n").alias("n_rows"),
        F.stack(F.lit(len(names)), *stack_cols).alias(
            "constraint", "n_pass", "n_fail"
        ),
    ).select(
        "constraint",
        "n_rows",
        "n_pass",
        "n_fail",
        (F.col("n_rows") - F.col("n_pass") - F.col("n_fail")).alias(
            "n_unknown"
        ),
    )
