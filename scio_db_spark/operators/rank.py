"""Scalable global ranking / ntile / running sums (no single-node sort).

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY is the
classic 100 TB trap: Spark plans it as ``Exchange SinglePartition`` —
every row moves to ONE task. The operators here compute identical
results with the data path staying fully partitioned, TeraSort-style:

1. **Deterministic boundary sample**: hash-filter the order-key tuples
   (``xxhash64(key) % sample_mod == 0``), sort the small sample on one
   reducer, pick P-1 evenly-spaced boundary tuples. Everything is a
   pure function of the DATA — no RangePartitioner, whose reservoir
   sampling is seeded per plan-node instance: Catalyst column-prunes
   multi-consumer subtrees into DIFFERENT exchanges (measured: a
   (counts ⋈ data) two-branch formulation planned two independent
   range exchanges that sampled different bounds and mis-joined at
   num_partitions=8 — caught by this module's runtime guard).
2. **Partition id = boundary rank**: broadcast the one-row bounds
   frame; each row's ``__pid`` = number of boundary tuples that
   order-precede it. For all-numeric-or-ASC order specs the key is
   re-expressed as a NATIVELY comparable struct (DESC folded in by an
   order-reversing bijection — bitwise NOT for integrals, negation
   for float/decimal), so each probe is one comparison; at
   P ≥ _TWO_LEVEL_MIN_P the probe is a two-level √P block search
   (see _pid_probe for the measured design space, including why a
   generated O(log P) CASE tree loses in Spark's expression engine).
   Deterministic per row, so every plan branch that recomputes it
   agrees by construction.
3. **Windows partitioned by __pid**: ``row_number`` / running ``sum``
   over ``PARTITION BY __pid`` — ordinary hash exchanges, each
   partition holding ~n/P contiguous rows of the global order.
4. **Prefix offsets**: per-pid counts (and value sums) are a tiny
   P-row frame; its prefix-sum window funnels one row per pid, never
   data. Global rank = pid offset + local row number; global running
   sum = pid value-offset + local cumsum.

The order spec must be TOTAL (include a tiebreaker column) and the
order keys must be non-NULL (aggregate outputs are): ties or NULLs
straddling a boundary would otherwise get nondeterministic ranks.

A runtime guard (``assert_true(__lrn <= __n)``) still rides along: if
the per-row pid derivation ever diverges between the window branch and
the counts branch (e.g. someone reintroduces a nondeterministic
partitioner), some partition must by pigeonhole number more rows than
its count, turning silent rank corruption into a loud failure.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ORDER_RE = re.compile(
    r"^Column<'(.+?)(?: (ASC|DESC) NULLS (FIRST|LAST))?'>$"
)
_IDENT_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _parse_order(order_by: list[Column]) -> list[tuple[str, bool]]:
    """(column name, is_descending) pairs from sort Columns.

    Restricted to plain column references (``F.asc("c")`` /
    ``F.desc("c")`` / ``F.col("c")``): the boundary comparator needs
    the field name to address the sampled struct.
    """
    spec: list[tuple[str, bool]] = []
    for c in order_by:
        m = _ORDER_RE.match(str(c))
        if not m or not _IDENT_RE.fullmatch(m.group(1)):
            raise ValueError(
                f"rank operators need plain asc/desc column references "
                f"in order_by, got {c!s}; alias the expression to a "
                f"column first"
            )
        spec.append((m.group(1), (m.group(2) or "ASC") == "DESC"))
    return spec


def _cmp(
    spec: list[tuple[str, bool]],
    gx: Callable[[str], Column],
    gy: Callable[[str], Column],
) -> Column:
    """Lexicographic comparator: -1/0/1 as x precedes/ties/follows y
    in the order spec. NULL keys compare as ties (callers must keep
    order keys non-NULL)."""
    out = F.lit(0)
    for name, desc in reversed(spec):
        a, b = gx(name), gy(name)
        lt, gt = (F.lit(1), F.lit(-1)) if desc else (F.lit(-1), F.lit(1))
        out = F.when(a < b, lt).when(a > b, gt).otherwise(out)
    return out


_TWO_LEVEL_MIN_P = 128  # measured crossover, see _pid_probe docstring


def _native_asc_exprs(
    df: DataFrame, spec: list[tuple[str, bool]]
) -> list[Column] | None:
    """Per-column expressions whose NATURAL ascending order equals the
    requested order spec, or None when not expressible.

    A struct of these is directly comparable with ``<=`` — ONE native
    comparison per boundary probe instead of the nested-CASE
    lexicographic comparator (measured 2.5× faster per compare at
    sf0.1). DESC is folded in by an order-REVERSING bijection:
    integral columns via bitwise NOT (total, no overflow — unlike
    negation at LONG_MIN), float/decimal via negation (exact sign
    flip; NaN order keys are outside the contract, like NULLs).
    Non-numeric DESC (string, date, ...) has no such transform —
    callers fall back to the comparator path.
    """
    out: list[Column] = []
    for name, desc in spec:
        dt = df.schema[name].dataType.typeName()
        if not desc:
            out.append(F.col(name))
        elif dt in ("long", "integer", "short", "byte"):
            out.append(F.bitwise_not(F.col(name)))
        elif dt in ("double", "float") or dt.startswith("decimal"):
            out.append(-F.col(name))
        else:
            return None
    return out


def _pid_probe(
    bounds: Column,
    blocks: Column | None,
    le,
    p: int,
) -> Column:
    """Count of boundary tuples ≤ the row's key = the row's partition
    id, probed against the sorted bounds array. ``le`` maps a boundary
    tuple to the boolean "boundary ≤ this row's key" — one native
    struct comparison on the fast path, the lexicographic comparator
    for specs with no natural struct order (string/date DESC), so the
    √P two-level shape below serves BOTH paths (the comparator
    fallback was O(P)/row before this).

    Two shapes, both O(1)-size expressions (a giant generated
    binary-search CASE tree was measured and REJECTED: Spark's
    expression engine walks/compiles the whole O(P)-node tree — at
    P=2048 it ran no faster than the linear filter, 12.9 s vs 13.4 s
    per 1.5M rows, cost 10 s of py4j construction, and risks the
    codegen method-size cliff):

    - P < _TWO_LEVEL_MIN_P: one higher-order filter over the bounds —
      the codegen'd array loop costs ~4 ns/compare, unbeatable at
      small P (10M rows: 1.43 s vs the two-level's 3.26 s at P=32;
      crossover measured just above P=64 — linear 5.16 s vs 3.58 s
      at P=128).
    - P ≥ _TWO_LEVEL_MIN_P: two-level √P search — count full blocks
      via the precomputed block-representative array (each block's
      LAST element: rep ≤ key ⟹ every element of the block ≤ key),
      then scan only the one straddling block via slice(). 2√P
      compares/row: measured 12.85 s vs linear 80.8 s at P=2048
      (6.3×, 10M rows), and the per-row constant grows as √P, not P,
      with cluster size. (A 2-arg indexed filter avoiding the slice
      allocation was also measured: pathological — minutes — Spark's
      (value, index) lambda path is not an option.)

    ``bounds`` holds exactly p-1 sorted tuples or nothing (empty
    sample → every row lands in pid 0).
    """
    m = p - 1
    if blocks is None:
        return F.size(F.filter(bounds, le))
    s = _block_size(m)
    nb = F.size(F.filter(blocks, le))
    # base = elements in the counted blocks; the LAST block is short
    # (m may not divide by s), so cap at m or the top block's rows
    # would overcount past the end of the array.
    base = F.least(nb * F.lit(s), F.lit(m))
    cnt = F.size(F.filter(F.slice(bounds, base + 1, s), le))
    return F.when(F.size(bounds) == 0, F.lit(0)).otherwise(base + cnt)


def _block_size(m: int) -> int:
    import math

    return max(1, math.isqrt(max(0, m - 1)) + 1)


def _with_pid(
    df: DataFrame,
    order_by: list[Column],
    num_partitions: int | None,
    sample_mod: int,
) -> DataFrame:
    """Append ``__pid``: the row's range-partition id in the total
    order, a deterministic function of the row's key tuple and the
    hash-sampled boundary set."""
    spec = _parse_order(order_by)
    names = [n for n, _ in spec]
    p = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    native = _native_asc_exprs(df, spec)
    if native is not None:
        # Fast path: one natural struct ordering carries the whole
        # spec — array_sort needs no comparator lambda and every
        # boundary probe is ONE comparison.
        key_fields = [
            e.alias(f"k{i}") for i, e in enumerate(native)
        ]
        skey = F.struct(*key_fields)
        row_key = skey
        sorted_arr = F.array_sort(F.col("__arr"))
    else:
        skey = F.struct(*[F.col(n) for n in names])
        row_key = None
        sorted_arr = F.array_sort(
            F.col("__arr"),
            lambda x, y: _cmp(spec, lambda n: x[n], lambda n: y[n]),
        )
    sample = df.select(skey.alias("__s")).filter(
        F.pmod(F.xxhash64(F.col("__s")), F.lit(sample_mod)) == 0
    )
    if p >= 2:
        # Boundary i (1-based) = sample element at floor(m*i/p)+1 —
        # evenly spaced order statistics of the sample. m*i stays well
        # under 2^53, so the double division is exact enough for an
        # index. Empty sample → no bounds → every row lands in pid 0
        # (correct single-partition fallback for tiny inputs).
        arr = F.col("__arr")
        bounds = F.when(
            F.size(arr) > 0,
            F.transform(
                F.sequence(F.lit(1), F.lit(p - 1)),
                lambda i: F.element_at(
                    arr,
                    (F.floor(F.size(arr) * i / F.lit(p)) + 1).cast("int"),
                ),
            ),
        ).otherwise(F.filter(arr, lambda _: F.lit(False)))
    else:
        bounds = F.filter(F.col("__arr"), lambda _: F.lit(False))
    bcols = [bounds.alias("__bounds")]
    two_level = p >= _TWO_LEVEL_MIN_P
    bframe = sample.agg(F.collect_list("__s").alias("__arr")).select(
        sorted_arr.alias("__arr")
    ).select(*bcols)
    if two_level:
        m, s = p - 1, _block_size(p - 1)
        nblocks = -(-m // s)
        # guard the EMPTY-bounds case (tiny input, no sample rows):
        # element_at on an empty array throws — mirror the bounds
        # fallback so every row lands in pid 0 via _pid_probe's own
        # size()==0 arm
        bframe = bframe.select(
            F.col("__bounds"),
            F.when(
                F.size(F.col("__bounds")) > 0,
                F.transform(
                    F.sequence(F.lit(1), F.lit(nblocks)),
                    lambda i: F.element_at(
                        F.col("__bounds"),
                        F.least(i * F.lit(s), F.lit(m)).cast("int"),
                    ),
                ),
            ).otherwise(
                F.filter(F.col("__bounds"), lambda _: F.lit(False))
            ).alias("__blocks"),
        )
    # ONE-ROW broadcast (BroadcastNestedLoopJoin by necessity — there
    # is no join key; the "probe" is an O(log P) binary search of the
    # bounds array per row). The documented non-NULL order-key
    # contract is enforced at runtime: a NULL key would compare as a
    # tie in _cmp, silently mis-ranking while both plan branches agree
    # (so the __lrn <= __n guard could never fire for this class) —
    # assert_true turns it into a loud failure instead. It returns
    # NULL on success; the coalesce adds 0 to the pid, which keeps
    # Catalyst from pruning it as dead code.
    nn = F.lit(True)
    for n in names:
        nn = nn & F.col(n).isNotNull()
    null_guard = F.coalesce(
        F.assert_true(
            nn,
            F.lit(
                "rank core: NULL order key — the order spec must be "
                "total over non-NULL columns (operators/rank.py)"
            ),
        ).cast("long"),
        F.lit(0),
    )
    if native is not None:
        le = lambda b: b <= row_key  # noqa: E731 — one native compare
    else:
        # Comparator fallback (non-numeric DESC keys): the same probe
        # shapes with the lexicographic comparator as the ≤ predicate.
        # Correct for every orderable type; O(√P)/row at
        # P ≥ _TWO_LEVEL_MIN_P via the shared two-level block search
        # (was O(P)/row before round 8 — the linear filter).
        le = lambda b: (  # noqa: E731
            _cmp(spec, lambda n: b[n], lambda n: F.col(n)) <= 0
        )
    probe = _pid_probe(
        F.col("__bounds"),
        F.col("__blocks") if two_level else None,
        le,
        p,
    )
    out = df.crossJoin(F.broadcast(bframe)).withColumn(
        "__pid", (probe + null_guard).cast("long")
    )
    return out.drop("__bounds", "__blocks")


def _ranked_core(
    df: DataFrame,
    order_by: list[Column],
    val_col: str | None = None,
    num_partitions: int | None = None,
    sample_mod: int = 64,
) -> DataFrame:
    """Shared core. Returns ``df``'s columns plus ``__grank`` (global
    1-based rank), ``__total_n`` (global row count) and — when
    ``val_col`` is given (must be an exact integer column; float
    prefix sums are order-dependent) — ``__gcum`` (global inclusive
    running sum) and ``__total_v`` (global sum)."""
    pided = _with_pid(df, order_by, num_partitions, sample_mod)
    w = Window.partitionBy("__pid").orderBy(*order_by)
    numbered = pided.withColumn(
        "__lrn", F.row_number().over(w).cast("long")
    )
    if val_col is not None:
        numbered = numbered.withColumn(
            "__lcum",
            F.sum(val_col)
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
    # Per-pid totals aggregate ``pided`` directly (not the windowed
    # frame): Catalyst prunes this branch to the key columns and AQE's
    # stage reuse dedups the shared upstream exchanges, so the extra
    # cost is a map-side probe + partial agg — no second window sort
    # (measured ~8% faster than a windowed-frame derivation at sf0.1).
    # Even if reuse ever stops firing this is only a perf loss: __pid
    # is a deterministic function of the row, so independently
    # recomputed branches still agree (and the assert_true guard
    # below checks they do).
    aggs = [F.count(F.lit(1)).alias("__n")]
    if val_col is not None:
        aggs.append(F.sum(val_col).cast("long").alias("__v"))
    counts = pided.groupBy("__pid").agg(*aggs)
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off_cols = [
        F.col("__pid"),
        F.col("__n"),
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__n").over(w_all).alias("__total_n"),
    ]
    if val_col is not None:
        off_cols += [
            F.coalesce(F.sum("__v").over(w_off), F.lit(0)).alias("__voff"),
            F.sum("__v").over(w_all).alias("__total_v"),
        ]
    offsets = counts.select(*off_cols)
    # Divergence guard — see module docstring. assert_true returns
    # NULL on success, so the coalesce adds 0 to the rank; folding it
    # into a kept column stops Catalyst pruning it into dead code.
    guard = F.coalesce(
        F.assert_true(
            F.col("__lrn") <= F.col("__n"),
            F.lit(
                "rank core: partition-id derivation diverged between "
                "branches (see operators/rank.py)"
            ),
        ).cast("long"),
        F.lit(0),
    )
    out = numbered.join(F.broadcast(offsets), "__pid").withColumn(
        "__grank", (F.col("__off") + F.col("__lrn") + guard).cast("long")
    )
    if val_col is not None:
        out = out.withColumn(
            "__gcum", (F.col("__voff") + F.col("__lcum")).cast("long")
        )
    drop = ["__pid", "__lrn", "__off", "__n"]
    if val_col is not None:
        drop += ["__voff", "__lcum"]
    return out.drop(*drop)


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``rank_col`` = 1-based position in the total order."""
    return (
        _ranked_core(df, order_by, None, num_partitions)
        .withColumnRenamed("__grank", rank_col)
        .drop("__total_n")
    )


def global_ntile(
    df: DataFrame,
    order_by: list[Column],
    k: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY ...)`` without the SinglePartition funnel.

    Exact SQL ntile semantics (first ``n mod k`` buckets get one extra
    row), derived from the global rank in pure integer arithmetic —
    identical output to the window form at any scale. The order spec
    must be total (include a tiebreaker).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ranked = _ranked_core(df, order_by, None, num_partitions)
    # Exact SQL ntile: q = n DIV k rows per bucket, the first n MOD k
    # buckets take one extra. The ELSE branch's DIV by q is reachable
    # only when q >= 1 (q = 0 puts every rank inside the WHEN arm).
    tile = F.expr(
        f"CASE WHEN __grank <= (__total_n % {k}) * (__total_n DIV {k} + 1) "
        f"THEN (__grank - 1) DIV (__total_n DIV {k} + 1) + 1 "
        f"ELSE (__total_n % {k}) + (__grank - (__total_n % {k}) "
        f"* (__total_n DIV {k} + 1) - 1) DIV (__total_n DIV {k}) + 1 END"
    )
    return (
        ranked.withColumn(tile_col, tile.cast("int"))
        .drop("__grank", "__total_n")
    )


def global_running_sum(
    df: DataFrame,
    order_by: list[Column],
    val_col: str,
    cum_col: str = "cum",
    total_col: str = "total",
    num_partitions: int | None = None,
) -> DataFrame:
    """``sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` plus the
    grand total, without a SinglePartition window.

    ``val_col`` must be an exact integer column (cents-scale money —
    float partial sums would make the prefix order-dependent).
    """
    out = _ranked_core(df, order_by, val_col, num_partitions)
    return (
        out.withColumnRenamed("__gcum", cum_col)
        .withColumnRenamed("__total_v", total_col)
        .drop("__grank", "__total_n")
    )


def global_running_max(
    df: DataFrame,
    order_by: list[Column],
    val_col: str,
    cum_col: str = "cum_max",
    rank_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """``max(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`` (and
    optionally the global rank) without a SinglePartition window.

    Same two-pass shape as global_running_sum: per-pid local running
    max, plus a P-row offsets frame whose prefix combine is GREATEST
    instead of +. Max is not invertible but it IS associative and
    commutative, which is all the decomposition needs. ``val_col``
    must be an orderable exact type (integers here; the guard rides
    the shared core).
    """
    pided = _with_pid(df, order_by, num_partitions, 64)
    w = Window.partitionBy("__pid").orderBy(*order_by)
    numbered = pided.withColumn(
        "__lrn", F.row_number().over(w).cast("long")
    ).withColumn(
        "__lmax",
        F.max(val_col).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    counts = pided.groupBy("__pid").agg(
        F.count(F.lit(1)).alias("__n"),
        F.max(val_col).alias("__mx"),
    )
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        F.col("__pid"),
        F.col("__n"),
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
        F.max("__mx").over(w_off).alias("__moff"),  # NULL for pid 0
    )
    guard = F.coalesce(
        F.assert_true(
            F.col("__lrn") <= F.col("__n"),
            F.lit(
                "rank core: partition-id derivation diverged between "
                "branches (see operators/rank.py)"
            ),
        ).cast("long"),
        F.lit(0),
    )
    out = numbered.join(F.broadcast(offsets), "__pid").withColumn(
        cum_col,
        # greatest() skips NULLs, so an empty prefix (pid 0) falls
        # back to the local running max alone
        F.greatest(F.col("__moff"), F.col("__lmax")),
    )
    if rank_col is not None:
        out = out.withColumn(
            rank_col,
            (F.col("__off") + F.col("__lrn") + guard).cast("long"),
        )
    else:
        out = out.withColumn(
            cum_col,
            F.col(cum_col) + (guard - guard),  # keep guard alive
        )
    return out.drop("__pid", "__lrn", "__lmax", "__off", "__n", "__moff")
