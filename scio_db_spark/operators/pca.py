"""Distributed PCA over an embedding column (partial-Gram reduction).

Embedding-space analytics for the training-data pipeline: intrinsic
dimensionality, variance concentration, whitening before ANN/near-dup
thresholds, and 2-D projection for corpus maps.

Distributed design: the ONLY data-sized pass is one Arrow-batched
``mapInPandas`` sweep in which every partition emits a single partial
row — (count, per-dim sums, flattened dim×dim Gram matrix). That is
the classic map-side-combine covariance reduction: driver traffic is
``partitions × (dim² + dim + 1)`` doubles, independent of row count,
so the pattern is identical at 60k rows and at 100 TB. The driver
assembles the covariance (Gram − n·μμᵀ)/(n−1) and eigendecomposes the
tiny dim×dim matrix locally (O(dim³), microseconds at dim=64 — the
same split MLlib's RowMatrix.computePrincipalComponents uses).

``project`` emits principal-component scores as pure Column
expressions (element_at dot chains), so downstream plans stay inside
whole-stage codegen — Python appears only in the one reduction pass,
where per-element built-ins would explode dim× rows per vector.

Reference parity: no counterpart in the reference engine — this is
part of the embedding-analytics extension surface (SURVEY.md §6)
alongside ANN and k-means.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
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
        StructField("n", LongType()),
        StructField("dim_sum", ArrayType(DoubleType())),
        StructField("gram", ArrayType(DoubleType())),  # row-major dim×dim
    ]
)


@dataclass
class PCAModel:
    mean: list[float]  # dim
    components: list[list[float]]  # n_components × dim, orthonormal
    explained_variance: list[float]  # eigenvalues, descending
    explained_variance_ratio: list[float]
    n_rows: int


def _partial_gram_fn(vec_col: str):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        n, s, g = 0, None, None
        for pdf in batches:
            # NULL vectors would make np.asarray build an object array
            # and np.isfinite raise — drop them row-scoped (same rule
            # as the NaN filter below).
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            # Drop non-finite rows: one NaN vector would make the Gram
            # matrix (and then eigh) NaN — poison stays row-scoped,
            # mirroring kmeans/quantize.
            finite = np.isfinite(x).all(axis=1)
            if not finite.all():
                x = x[finite]
                if not len(x):
                    continue
            n += len(x)
            s = x.sum(axis=0) + (0 if s is None else s)
            g = x.T @ x + (0 if g is None else g)
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "dim_sum": [s.tolist()],
                    "gram": [g.reshape(-1).tolist()],
                }
            )

    return fn


def pca_fit(
    df: DataFrame, vec_col: str, n_components: int = 2
) -> PCAModel:
    import numpy as np

    partials = (
        df.select(vec_col)
        .mapInPandas(_partial_gram_fn(vec_col), _PARTIAL_SCHEMA)
        .collect()
    )
    if not partials:
        raise ValueError("empty input")
    dim = len(partials[0].dim_sum)
    n = sum(r.n for r in partials)
    if n < 2:
        raise ValueError("need at least 2 rows")
    # Sort partials for a deterministic summation order. The key must
    # cover EVERY float-summed payload: partitions that tie on
    # (n, dim_sum) can still carry different gram matrices, and any
    # field outside the key would sum in collect order — run-to-run
    # nondeterministic fitted components.
    parts = sorted(
        partials, key=lambda r: (r.n, tuple(r.dim_sum), tuple(r.gram))
    )
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for r in parts:
        s += np.asarray(r.dim_sum)
        g += np.asarray(r.gram).reshape(dim, dim)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = []
    for i in order:
        v = evecs[:, i]
        # Deterministic sign: make the largest-|.| coordinate positive.
        j = int(np.argmax(np.abs(v)))
        comps.append((v if v[j] >= 0 else -v).tolist())
    ev = [float(evals[i]) for i in order]
    total = float(evals.sum())
    # Zero-variance input (all rows identical) has no direction to
    # explain: ratios are defined as 0 rather than dividing by zero.
    ratios = [x / total for x in ev] if total > 0 else [0.0] * len(ev)
    return PCAModel(
        mean=mean.tolist(),
        components=comps,
        explained_variance=ev,
        explained_variance_ratio=ratios,
        n_rows=n,
    )


def project(
    df: DataFrame,
    vec_col: str,
    model: PCAModel,
    prefix: str = "pc",
) -> DataFrame:
    """Append centered principal-component scores as pc1..pcN columns
    — no Python in the plan. Each component is ONE JVM-side
    `F.expr` parse of the same left-associated centered-product chain
    the per-element Column form built (identical tree, bit-identical
    scores); the Column form cost ~3·dim py4j round trips per
    component of pure driver time (the `_dot_with_literal` lesson,
    operators/kmeans.py)."""
    ident = "`" + vec_col.replace("`", "``") + "`"
    cols = {}
    for ci, comp in enumerate(model.components, start=1):
        chain = " + ".join(
            f"(CAST(element_at({ident}, {i}) AS DOUBLE) - "
            f"CAST('{float(m)!r}' AS DOUBLE)) * "
            f"CAST('{float(w)!r}' AS DOUBLE)"
            for i, (w, m) in enumerate(zip(comp, model.mean), start=1)
        )
        cols[f"{prefix}{ci}"] = F.expr(chain)
    return df.withColumns(cols)
