"""Snapshot-diff CDC: derive a change feed from two table snapshots.

Many upstreams can't emit change streams — they hand over full
snapshots (the reference's bounded reload path: HCEngine.scala's
initial-load reread is exactly this shape). ``snapshot_diff`` turns
two snapshots into the insert/update/delete feed a downstream
incremental consumer needs, which is the bridge between the
reference's batch reload world and its streaming mediation world.

Distributed shape (what must survive 100 TB):

- ONE full outer join hash-partitioned on the key — each side is
  shuffled exactly once and the op classification is a map-side
  projection over the co-partitioned rows. No window, no sort.
- Unchanged rows are filtered OUT inside the same stage, so the
  output is proportional to the CHANGE volume, not the snapshot
  size — the property that makes downstream incremental consumers
  cheaper than reprocessing.
- Column comparison is a null-safe struct equality: one JVM-side
  comparison regardless of how many compared columns, and NULL ==
  NULL counts as unchanged (SQL join semantics would resurrect
  NULL-bearing rows as perpetual updates).
- At very wide rows, pass a precomputed digest column as the single
  ``compare_cols`` entry so the shuffle carries a hash instead of
  the full payload; the classification logic is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Rows that changed between snapshots, classified I / U / D.

    Output: ``key_cols``, ``op`` ('I'|'U'|'D'), then ``old_<c>`` and
    ``new_<c>`` for every compared column (NULL on the absent side of
    inserts/deletes). Rows equal on all ``compare_cols`` are dropped.
    """
    # Side presence is tracked by a non-null indicator literal, NOT by
    # the key value: a genuinely NULL key (which equi-joins never
    # match, so it surfaces as one D row and/or one I row — standard
    # SQL join semantics) would otherwise read as "absent" on its own
    # side and get the opposite op with swapped old_/new_ columns.
    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in key_cols],
        F.struct(*compare_cols).alias("__old"),
        F.lit(1).alias("__o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in key_cols],
        F.struct(*compare_cols).alias("__new"),
        F.lit(1).alias("__n_present"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")

    old_absent = F.col("__o_present").isNull()
    new_absent = F.col("__n_present").isNull()
    op = (
        F.when(old_absent, F.lit("I"))
        .when(new_absent, F.lit("D"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("U"))
    )  # NULL op == unchanged -> filtered
    out = j.withColumn("op", op).filter(F.col("op").isNotNull())
    return out.select(
        *[
            F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k)
            for k in key_cols
        ],
        "op",
        *[F.col(f"__old.{c}").alias(f"old_{c}") for c in compare_cols],
        *[F.col(f"__new.{c}").alias(f"new_{c}") for c in compare_cols],
    )
