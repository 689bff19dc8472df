"""Full Lloyd's k-means (spherical) over an embedding column.

Completes the clustering family: ``plans/vecops.py`` exposes the
single assignment step (``emb_kmeans_assign``, oracle-checked); this
module iterates it to convergence — the operator behind SemDeDup-style
cluster pruning and IVF codebook training at corpus scale.

Distributed design (the part that must survive 100 TB):

- Each iteration is ONE Arrow-batched ``mapInPandas`` pass over the
  data: every partition assigns its vectors to the nearest centroid
  (vectorized numpy argmax over a k×dim broadcast matrix — k·dim
  floats, constant size) and emits at most k partial rows
  (cid, count, component sums, inertia). No shuffle at all: the
  per-partition partials (≤ partitions × k rows, data-independent)
  are collected and combined on the driver, exactly like Spark's own
  treeAggregate-based MLlib implementation but without the RDD API.
- The driver state is k×dim floats + the iteration history — never
  data-sized. Convergence is centroid shift under ``tol`` (early
  stop) or ``max_iters``.
- Assignment is cosine (spherical k-means): the update step is the
  per-cluster mean re-normalized to unit length. Ties break to the
  smallest centroid id (numpy argmax picks the first maximum), the
  same deterministic tiebreak the oracle-checked assignment query
  uses.

Python is the right tool here precisely where the guide says it is:
the per-dimension mean update has no efficient built-in Column form
(elementwise array aggregation would explode dim× rows per vector),
while one vectorized numpy pass per partition is optimal — and the
driver never touches more than (partitions × k) summary rows.

Reference parity: the reference engine has no clustering operator;
this extends the LLM-pipeline surface (SURVEY.md §6 extension ops)
alongside MinHash/SimHash/ANN.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("cid", LongType()),
        StructField("n", LongType()),
        StructField("vec_sum", ArrayType(DoubleType())),
        StructField("sim_sum", DoubleType()),
    ]
)


@dataclass
class KMeansModel:
    centroids: list[list[float]]  # unit-normalized, k × dim
    inertia_history: list[float] = field(default_factory=list)
    # mean cosine distance (1 - cos) per iteration, monotone non-increasing
    iterations: int = 0
    converged: bool = False


def _normalize(vec: list[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in vec))
    return [x / n for x in vec] if n > 0 else list(vec)


def _partial_stats_fn(centroids: list[list[float]], vec_col: str):
    """Per-partition: assign (vectorized argmax cosine) + partial sums."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cents = np.asarray(centroids, dtype=np.float64)  # k × dim, unit rows
        acc_n: dict[int, int] = {}
        acc_sum: dict[int, "np.ndarray"] = {}
        acc_sim: dict[int, float] = {}
        for pdf in batches:
            # NULL vectors first: np.asarray over a list containing
            # None yields an object/ragged array and np.isfinite then
            # raises — a NULL row must stay row-scoped like NaN rows.
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            vecs = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )  # n × dim
            # Poison rows stay row-scoped: one NaN/Inf vector would
            # otherwise flow into a centroid sum and silently corrupt
            # the whole model (NaN propagates through every later
            # iteration). Drop non-finite rows from the partials.
            finite = np.isfinite(vecs).all(axis=1)
            if not finite.all():
                vecs = vecs[finite]
                if not len(vecs):
                    continue
            norms = np.linalg.norm(vecs, axis=1)
            norms[norms == 0] = 1.0
            unit = vecs / norms[:, None]
            sims = unit @ cents.T  # n × k cosine (centroids are unit)
            cid = np.argmax(sims, axis=1)  # first max → smallest cid
            best = sims[np.arange(len(sims)), cid]
            for c in np.unique(cid):
                m = cid == c
                key = int(c)
                acc_n[key] = acc_n.get(key, 0) + int(m.sum())
                s = unit[m].sum(axis=0)
                acc_sum[key] = acc_sum.get(key, 0) + s
                acc_sim[key] = acc_sim.get(key, 0.0) + float(best[m].sum())
        if acc_n:
            yield pd.DataFrame(
                {
                    "cid": list(acc_n),
                    "n": [acc_n[c] for c in acc_n],
                    "vec_sum": [acc_sum[c].tolist() for c in acc_n],
                    "sim_sum": [acc_sim[c] for c in acc_n],
                }
            )

    return fn


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    id_col: str | None = None,
    max_iters: int = 10,
    tol: float = 1e-6,
    init_centroids: list[list[float]] | None = None,
) -> KMeansModel:
    """Iterate Lloyd's algorithm to convergence; returns the model.

    Initial centroids default to the vectors of the k smallest
    ``id_col`` rows (deterministic seed, the same convention as the
    oracle-checked assignment query); pass ``init_centroids`` to seed
    from a sample or a previous model instead.
    """
    if init_centroids is None:
        if id_col is None:
            raise ValueError("need id_col or init_centroids")
        rows = (
            df.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(k)
            .collect()
        )
        if len(rows) < k:
            raise ValueError(f"k={k} but only {len(rows)} rows")
        init_centroids = [list(r[1]) for r in rows]
    cents = [_normalize(c) for c in init_centroids]
    dim = len(cents[0])

    model = KMeansModel(centroids=cents)
    data = df.select(vec_col)
    for it in range(max_iters):
        partials = data.mapInPandas(
            _partial_stats_fn(model.centroids, vec_col), _PARTIAL_SCHEMA
        ).collect()
        # driver combine: ≤ partitions × k rows, sorted for determinism
        n_by, sum_by, sim_total, n_total = {}, {}, 0.0, 0
        # Total sort key: cid alone leaves same-cid partials from
        # different partitions in collect order, making the float sums
        # (and so the fitted centroids) run-to-run nondeterministic.
        # sim_sum is part of the key because it is float-summed too —
        # partials tying on (cid, n, vec_sum) may still differ there.
        for r in sorted(
            partials,
            key=lambda r: (r.cid, r.n, tuple(r.vec_sum), r.sim_sum),
        ):
            n_by[r.cid] = n_by.get(r.cid, 0) + r.n
            prev = sum_by.get(r.cid, [0.0] * dim)
            sum_by[r.cid] = [a + b for a, b in zip(prev, r.vec_sum)]
            sim_total += r.sim_sum
            n_total += r.n
        model.inertia_history.append(
            1.0 - sim_total / n_total if n_total else 0.0
        )
        new_cents = [
            _normalize([x / n_by[c] for x in sum_by[c]])
            if c in n_by and n_by[c] > 0
            else model.centroids[c]  # empty cluster keeps its centroid
            for c in range(len(model.centroids))
        ]
        shift = max(
            math.sqrt(
                sum((a - b) * (a - b) for a, b in zip(old, new))
            )
            for old, new in zip(model.centroids, new_cents)
        )
        model.centroids = new_cents
        model.iterations = it + 1
        if shift < tol:
            model.converged = True
            break
    return model


def assign(
    df: DataFrame, vec_col: str, model: KMeansModel, out_col: str = "cid"
) -> DataFrame:
    """Assignment column from a fitted model — pure Column expression
    (no Python), so it composes into any downstream plan (SemDeDup
    pair join, IVF probe) inside whole-stage codegen.

    A zero-norm vector scores NULL against every centroid (see
    _dot_with_literal) and gets a NULL assignment here; the
    window-argmax form (plans/libops._trained_cells) instead falls
    through to the smallest cid — callers that must agree with that
    form should filter zero vectors first."""
    if len(model.centroids) == 1:
        # degenerate single-cluster model: everything is cluster 0
        # (F.greatest requires >= 2 columns)
        return df.withColumn(out_col, F.lit(0).cast("bigint"))
    sims = [
        _dot_with_literal(vec_col, c).alias(f"_sim_{i}")
        for i, c in enumerate(model.centroids)
    ]
    best = F.greatest(*[F.col(f"_sim_{i}") for i in range(len(sims))])
    expr = F.lit(None).cast("bigint")
    # reversed so the smallest cid wins ties, matching fit-time argmax
    for i in reversed(range(len(sims))):
        expr = F.when(F.col(f"_sim_{i}") == best, F.lit(i)).otherwise(expr)
    return (
        df.select("*", *sims)
        .withColumn(out_col, expr)
        .drop(*[f"_sim_{i}" for i in range(len(sims))])
    )


def _dot_with_literal(vec_col: str, centroid: list[float]) -> Column:
    """cos(vec, centroid) for a unit-norm literal centroid: dot product
    over element_at divided by |vec| (centroid norm is 1).

    Built as ONE F.expr parse instead of per-element Column ops: the
    Column form costs ~3·dim py4j round trips per centroid (~10 s of
    driver time for a k=16, dim=64 model — measured), the SQL string
    parses JVM-side in one call. The expression tree is identical
    (left-associated double sums, repr'd literals round-trip exactly),
    so results are bit-for-bit unchanged."""
    # Backtick-quote the identifier: assign()'s public API accepts any
    # column name via Column ops elsewhere, so names needing quoting
    # (spaces, dots, hyphens) must not break — or worse, silently bind
    # to a different expression — inside this SQL string.
    ident = "`" + vec_col.replace("`", "``") + "`"
    terms = " + ".join(
        f"CAST(element_at({ident}, {i}) AS DOUBLE) * "
        f"CAST('{float(w)!r}' AS DOUBLE)"
        for i, w in enumerate(centroid, start=1)
    )
    norm = (
        f"sqrt(aggregate({ident}, CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    # nullif: Spark x/0.0 yields NULL under ANSI while DuckDB yields
    # ±Inf/NaN — a zero-norm vector must score NULL on BOTH engines or
    # the argmax cells diverge cross-engine (the codebase-wide cosine
    # contract, functions/vectors.cosine_sql).
    return F.expr(f"({terms}) / nullif({norm}, CAST(0.0 AS DOUBLE))")


def topk_cells(
    vec_col: str, cents: list[list[float]], keep: int
) -> Column:
    """array<struct<cid int, sim double>> — the ``keep`` nearest
    unit-norm literal centroids per row, as one MAP-ONLY expression.

    The per-centroid cosine is bit-for-bit `_dot_with_literal`'s value:
    a left fold over ``zip_with`` products associates identically to
    its left-parenthesized ``t1 + t2 + …`` chain (the ``0.0`` seed is
    an IEEE identity except when the running sum is exactly ``-0.0``,
    the same accepted class as the codebase-wide ``aggregate`` norm
    seed), and every weight round-trips through ``repr``. Verified
    empirically: 0 of 90 000 sims differ at repr precision vs the
    unrolled form on the sf0.1 embeddings, k=45.

    Why this shape and not unrolled-sum columns + ``stack`` +
    ``row_number`` (the previous form): at k·dim ≈ 3 000 terms the
    unrolled plan fails whole-stage codegen (64 KB JVM method limit),
    ships ~12 MiB task binaries, and falls back to interpreted eval —
    measured 11× slower — while the argmax here never leaves the row:
    the codebook is ONE 2-D array literal (k·dim doubles of DATA, not
    k·dim expression nodes), the dots are a ``transform`` over it, and
    the top-``keep`` selection is a per-row ``array_sort`` — no k-way
    column explosion, no Window, and crucially NO exchange: the
    previous form shuffled N·k rows by vec_id just to rank sims that
    are born in the same row. Sort order matches the oracle's
    ``ORDER BY sim DESC, cid``: NULL sims (zero-norm vectors) last,
    ties to the smallest cid.

    The row-norm subexpression is re-evaluated per centroid after
    projection collapse (k·dim extra fold steps per row); accepted —
    it is pure map work, and the measured end-to-end win over the
    codegen-failing form is >10×. At IVF scale (k ~ 31 000 cells for
    10⁹ vectors) the literal is k·dim·8 bytes of plan data (~16 MB);
    beyond that, train/score through `kmeans_fit`'s broadcast-matrix
    ``mapInPandas`` path instead.
    """
    ident = "`" + vec_col.replace("`", "``") + "`"
    lit2d = "array(" + ", ".join(
        "array(" + ", ".join(
            f"CAST('{float(w)!r}' AS DOUBLE)" for w in c
        ) + ")"
        for c in cents
    ) + ")"
    norm = (
        f"sqrt(aggregate({ident}, CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    )
    pairs = (
        f"transform({lit2d}, (c, i) -> named_struct("
        f"'cid', i, "
        f"'sim', aggregate(zip_with({ident}, c, "
        f"(x, y) -> CAST(x AS DOUBLE) * y), CAST(0.0 AS DOUBLE), "
        f"(a, t) -> a + t) / nullif({norm}, CAST(0.0 AS DOUBLE))))"
    )
    cmp = (
        "(l, r) -> CASE "
        "WHEN l.sim IS NULL AND r.sim IS NULL THEN l.cid - r.cid "
        "WHEN l.sim IS NULL THEN 1 "
        "WHEN r.sim IS NULL THEN -1 "
        "WHEN l.sim > r.sim THEN -1 "
        "WHEN l.sim < r.sim THEN 1 "
        "ELSE l.cid - r.cid END"
    )
    return F.expr(f"slice(array_sort({pairs}, {cmp}), 1, {int(keep)})")
