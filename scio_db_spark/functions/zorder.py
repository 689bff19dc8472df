"""Z-order (Morton) interleaving for multi-column data clustering.

``compact(sort_by=[a, b])`` clusters lexicographically: parquet
row-group min/max stats become selective for ``a`` but nearly useless
for ``b`` alone (every row group spans b's full range). Interleaving
the bits of both columns into one Morton value and clustering on THAT
gives every participating column partially-ordered locality — a filter
on any single column can skip most row groups/files. This is the same
lever a transactional format's OPTIMIZE ZORDER pulls, expressed in
plain Spark expressions (the interleave is ~bits×cols shift/mask terms
inside whole-stage codegen — no UDF).

Scale note: at 100 TB the win is at PLANNING time — parquet footer
stats prune files/row groups before any task launches. Measured
pruning factors are pinned in tests/test_zorder.py via the actual
parquet row-group statistics, not timings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def minmax_scale(col: Column, lo, hi, bits: int) -> Column:
    """Affine-map a numeric column from [lo, hi] onto the integer grid
    [0, 2^bits), saturating at the edges (values outside [lo, hi] —
    e.g. inserted after the stats were taken — still get a valid
    cell). The computation is ALWAYS double: long values beyond 2^53
    may land one cell off near a boundary, which affects clustering
    quality only (the z-value orders rows; no data passes through it),
    and the row-group min/max stats pruning relies on remain exact
    because they are computed from the original column."""
    if hi <= lo:
        return F.lit(0).cast("long")
    n_cells = 1 << bits
    span = hi - lo
    cell = F.floor(
        (col.cast("double") - F.lit(float(lo)))
        * F.lit(float(n_cells))
        / F.lit(float(span))
    ).cast("long")
    # NULL values get cell 0 (cluster together at the low edge) —
    # a NULL cell would null the whole interleaved z-value
    return F.coalesce(
        F.least(F.greatest(cell, F.lit(0)), F.lit(n_cells - 1)),
        F.lit(0),
    )


def z_value(cols: list[Column], bits: int = 12) -> Column:
    """Morton interleave of already-scaled non-negative ints, each in
    [0, 2^bits). Bit b of column i lands at output bit b*len(cols)+i;
    total bits must fit a long (bits * len(cols) <= 62)."""
    n = len(cols)
    if n == 0:
        raise ValueError("z_value needs at least one column")
    if bits * n > 62:
        raise ValueError(
            f"{bits} bits x {n} cols = {bits * n} interleaved bits "
            f"does not fit a long; lower bits"
        )
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            out = out + F.shiftleft(
                F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                b * n + i,
            ).cast("long")
    return out


def with_z_order(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    out_col: str = "__z",
) -> DataFrame:
    """Append the Morton value for ``cols``, min-max scaling each
    column from ONE stats pass over ``df`` (driver-side two numbers
    per column — cheap next to the rewrite that follows)."""
    numeric = ("long", "integer", "short", "byte", "double", "float",
               "date", "timestamp", "timestamp_ntz")
    exprs: dict[str, Column] = {}
    for c in cols:
        dt = df.schema[c].dataType.typeName()
        if not (dt in numeric or dt.startswith("decimal")):
            raise ValueError(
                f"z-order column {c!r} has type {dt}; only numeric/"
                f"temporal columns have the ordered grid the Morton "
                f"interleave needs (hash or dictionary-encode strings "
                f"first)"
            )
        # date has no direct double cast; day number preserves order
        exprs[c] = (
            F.unix_date(F.col(c)).cast("double")
            if dt == "date"
            else F.col(c).cast("double")
        )
    stats = df.agg(
        *[F.min(exprs[c]).alias(f"__lo_{c}") for c in cols],
        *[F.max(exprs[c]).alias(f"__hi_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        # all-NULL/empty input: constant cell 0 (nothing to cluster)
        minmax_scale(
            exprs[c],
            stats[f"__lo_{c}"] if stats[f"__lo_{c}"] is not None else 0,
            stats[f"__hi_{c}"] if stats[f"__hi_{c}"] is not None else 0,
            bits,
        )
        for c in cols
    ]
    return df.withColumn(out_col, z_value(scaled, bits))
