"""As-of join — a custom operator Spark's join menu lacks.

``asof_join(left, right)`` attaches, to every left row, the LATEST
right row of the same key with ``right.time <= left.time`` (the
time-series "most recent fact as of this moment" join).

Spark-first formulation (no inequality join): union both sides tagged,
then one pass of ``last(ignorenulls=True)`` over a per-key window
ordered by (time, side) carries the most recent right payload forward
onto each left row. Cost = ONE hash shuffle on the key + a per-key
sort — the same shape as any windowed aggregation, with none of the
range-join blow-up (an inequality join materializes |L|×|R| candidate
pairs per key before filtering; this materializes |L|+|R| rows total).
That property is what makes it the scale path at 100 TB.

Ties: a right row at exactly left.time matches (<=). Multiple right
rows at the same (key, time) are resolved deterministically by
``tie_col`` (max wins) INSIDE the merge's sort order — same-instant
facts scan in tie order so the running last() carries the winner;
callers get one defined answer, same as deduping the build side of
any join, without a separate dedup shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    tie_col: str | None = None,
    direction: str = "backward",
    tolerance_s: int | None = None,
) -> DataFrame:
    """Left as-of join; right ``payload_cols`` appended (null = no match).

    ``direction="backward"`` (default) attaches the LATEST right row
    with ``right.time <= left.time``; ``"forward"`` the EARLIEST right
    row with ``right.time >= left.time`` ("time to next event" /
    next-fact lookups). Forward is the same one-shuffle merge scanned
    in descending time order — ``last(ignorenulls)`` then carries the
    nearest FUTURE fact backward onto each left row; a right row at
    exactly left.time matches in both directions.

    ``tolerance_s`` bounds the match horizon (pandas merge_asof's
    ``tolerance``): a carried fact further than this many seconds from
    the left row's time is nulled out after the fill — attribution
    windows, staleness caps. The merge itself is unchanged (one
    shuffle); the bound is a post-fill projection."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    # Fail fast on output-name collisions: a payload column named like
    # a left column would emit two same-named output columns — the
    # DataFrame builds, but the first downstream reference dies with
    # an ambiguous-column AnalysisException far from the cause. Alias
    # the right side (e.g. col('price').alias('right_price')) first.
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload_cols {sorted(clash)} collide with left columns; "
            "alias the right-side columns before the as-of join"
        )
    # With a tolerance the matched fact's own time travels inside the
    # payload struct as '__rt'; a payload column with that (or any
    # '__'-reserved) name would create a duplicate struct field and
    # silently corrupt the horizon check — refuse loudly instead.
    if tolerance_s is not None:
        reserved = [c for c in payload_cols if c.startswith("__")]
        if reserved:
            raise ValueError(
                f"payload_cols {sorted(reserved)} use the reserved "
                "'__' prefix, which collides with the internal "
                "'__rt' horizon field when tolerance_s is set; "
                "alias them first"
            )
    # NULL-time or NULL-key right rows can never satisfy
    # "right.time <= left.time on the same key" — drop them BEFORE the
    # merge: nulls sort first in the window, so a null-time payload
    # would otherwise be carried onto every left row preceding the
    # first real fact (and null keys would "match" null-key left rows,
    # which no SQL join does).
    right = right.filter(
        F.col(right_time).isNotNull() & F.col(key).isNotNull()
    )
    # Tie resolution rides INSIDE the merge window's sort order instead
    # of a separate row_number dedup pass (round-12 opt: the dedup
    # window cost its own Exchange on (key, right_time) + sort + filter
    # before the merge's Exchange on key — two shuffles of the right
    # side where one suffices). Same-instant right rows sort by
    # ``__tie`` ASC (nulls first), all BEFORE any left row at that
    # instant (__side), so the running last(ignorenulls) a left row
    # observes is exactly the max-tie row's payload — the row the old
    # rn=1 filter kept; non-winning ties are overwritten before any
    # left row can read them, in both scan directions.

    # The payload travels as ONE struct so last(ignorenulls) carries the
    # entire latest right ROW forward atomically — per-column fills
    # would mix values from different right rows whenever the latest
    # row holds a NULL in one payload column but not another.
    payload_struct_cols = [F.col(c) for c in payload_cols]
    if tolerance_s is not None:
        # carry the matched fact's own time inside the payload struct
        # so the horizon check can run AFTER the fill
        payload_struct_cols.append(F.col(right_time).alias("__rt"))
    # Struct types assembled in pure Python from the inputs' (already
    # analyzed, object-cached) schemas: the previous
    # ``right.select(struct(...)).schema`` probe ran a full analyzer
    # pass per asof_join build just to learn a type it could compute
    # locally (round-12 opt — plan-construction cost is part of every
    # measured pass and of real driver latency).
    from pyspark.sql.types import StructField, StructType

    r_schema = right.schema
    payload_fields = [r_schema[c] for c in payload_cols]
    if tolerance_s is not None:
        rt_f = r_schema[right_time]
        payload_fields.append(
            StructField("__rt", rt_f.dataType, rt_f.nullable)
        )
    payload_type = StructType(payload_fields)
    left_type = StructType(list(left.schema.fields))
    tie_cols_l: list = []
    tie_cols_r: list = []
    if tie_col is not None:
        tie_t = r_schema[tie_col].dataType
        tie_cols_l = [F.lit(None).cast(tie_t).alias("__tie")]
        tie_cols_r = [F.col(tie_col).alias("__tie")]
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),  # events sort AFTER same-instant facts
        *tie_cols_l,
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *tie_cols_r,
        F.lit(None).cast(left_type).alias("__left"),
        F.struct(*payload_struct_cols).alias("__payload"),
    )
    merged = l_tag.unionByName(r_tag)
    # Backward scans time ascending; forward scans descending, so the
    # running last(ignorenulls) holds the nearest future fact instead.
    # Either way __side keeps same-instant facts BEFORE the left row,
    # and NULL-time LEFT rows must sort before every fact (no
    # right.time can compare against NULL, so their payload is NULL):
    # ascending gets that from the NULLS FIRST default, descending
    # must ask for it — desc's NULLS LAST default would hand NULL-time
    # rows the earliest fact instead.
    order = (
        [F.asc("__t"), F.asc("__side")]
        if direction == "backward"
        else [F.col("__t").desc_nulls_first(), F.asc("__side")]
    )
    if tie_col is not None:
        # max tie wins: ASC within the same-instant fact group makes
        # the running last() carry the largest tie (nulls first, so a
        # null tie loses to any non-null — the old desc NULLS LAST
        # winner). Applies in both directions: the group's internal
        # scan order is all that changes.
        order.append(F.col("__tie").asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "__side",
        "__left",
        F.last("__payload", ignorenulls=True).over(w).alias("__payload"),
    )
    events_only = filled.filter(F.col("__side") == 1)
    if tolerance_s is None:
        return events_only.select(
            *[F.col(f"__left.{c}").alias(c) for c in left.columns],
            *[F.col(f"__payload.{c}").alias(c) for c in payload_cols],
        )
    lt = F.col(f"__left.{left_time}").cast("timestamp").cast("double")
    rt = F.col("__payload.__rt").cast("timestamp").cast("double")
    within = (
        (lt - rt <= F.lit(float(tolerance_s)))
        if direction == "backward"
        else (rt - lt <= F.lit(float(tolerance_s)))
    )
    return events_only.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[
            F.when(within, F.col(f"__payload.{c}")).alias(c)
            for c in payload_cols
        ],
    )
