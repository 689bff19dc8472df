"""Exact heavy hitters at scale: Misra-Gries candidates + exact verify.

The query "which keys exceed a φ fraction of all rows" is a plain
``GROUP BY … HAVING`` — but at 100 TB that aggregates EVERY distinct
key (billions of groups shuffled) to keep a handful. The classic
two-phase answer (Misra-Gries '82; the mergeable-summaries form of
Agarwal et al., and what Spark itself uses inside
``DataFrameStatFunctions.freqItems``) makes the big aggregation touch
only provable candidates:

1. **Candidate pass — map-only.** Each partition streams its rows
   through a Misra-Gries summary with ``m`` counters (admit new key /
   increment / decrement-all-on-overflow). MG guarantees every key
   whose LOCAL frequency exceeds ``n_p / m`` survives in the
   partition's summary, so a key absent from ALL summaries has global
   frequency ≤ Σ n_p/m = n/m. With ``m ≥ 2/φ`` the union of summary
   keys is therefore a guaranteed superset of every φ-heavy key. The
   pass emits ≤ partitions × m tiny (key, est) rows and shuffles
   nothing.
2. **Verify pass — exact.** Broadcast-semi-join the candidate set
   against the source and count exactly, keeping
   ``count · ⌈1/φ⌉ > n`` (integer cross-multiply — no division, no
   floats). Partial aggregation collapses map-side to ≤ |candidates|
   groups per partition, so the verify shuffle carries candidate keys
   only.

Phase 1 affects ONLY which keys get exactly counted, never the
result: the output is bit-identical to the naive full GROUP BY
(the DuckDB oracle twin), which is what makes an approximate sketch
safely oracle-checkable.

The Arrow-batched ``mapInPandas`` summary is the documented slow-path
exception (pure per-partition streaming state, no Column form); it
holds ≤ m dict entries regardless of partition size.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _mg_partial_fn(key_col: str, m: int, integral_key: bool):
    """Vectorized mergeable-summaries form: add each Arrow batch's
    value_counts, then — when over budget — subtract the (m+1)-th
    largest count and keep positives (the MG merge reduction; error
    per partition ≤ n_p/(m+1), which preserves the superset
    guarantee). NULL keys are excluded here and force-added as a
    candidate downstream, so their guarantee is unconditional.

    ``integral_key``: a NULL-bearing int64 chunk arrives float64-
    coerced from Arrow; a key ≥ 2^53 would be silently rounded BEFORE
    value_counts, so a heavy key could vanish from the candidate
    superset. Apply the exact_int64 refusal guard (after dropping the
    NULLs, which are handled downstream) so the coercion is either
    reversed bit-exactly or refused loudly — never silent."""
    from scio_db_spark.streaming.exactness import exact_int64

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            col = pdf[key_col]
            if integral_key and col.dtype.kind == "f":
                col = exact_int64(col.dropna())
            vc = col.value_counts(dropna=True)
            counters = (
                vc
                if counters.empty
                else counters.add(vc, fill_value=0).astype("int64")
            )
            if len(counters) > m:
                cut = counters.nlargest(m + 1).iloc[-1]
                counters = counters[counters > cut] - cut
        yield pd.DataFrame(
            {key_col: counters.index, "est": counters.to_numpy("int64")}
        )

    return fn


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    phi_inv: int,
    m: int | None = None,
) -> DataFrame:
    """(key, cnt): every key with count · phi_inv > total rows —
    EXACT counts, candidate-pruned by per-partition Misra-Gries.

    ``phi_inv`` is ⌈1/φ⌉ (e.g. 128 → keys above 1/128 of all rows).
    ``m`` (default ``2 · phi_inv``) is the per-partition counter
    budget; any ``m ≥ phi_inv`` preserves the superset guarantee, the
    2× default keeps estimates tighter. NULL keys are counted like
    any other key (null-safe join), matching SQL GROUP BY.
    """
    if m is None:
        m = 2 * phi_inv
    key_field = df.schema[key_col]
    partial_schema = StructType(
        [
            StructField(key_col, key_field.dataType, True),
            StructField("est", LongType(), False),
        ]
    )
    keys = df.select(key_col)
    # Pure-JVM one-row relation: createDataFrame parallelizes even a
    # ONE-ROW list over defaultParallelism Python-RDD partitions — 32
    # task launches each paying a Python-worker round trip (round-12
    # stage profile; and narrowing THAT with coalesce(1) is worse: one
    # task then evaluates all 32 Python partitions serially).
    null_cand = keys.sparkSession.range(0, 1, 1, 1).select(
        F.lit(None).cast(key_field.dataType).alias(key_col)
    )
    candidates = (
        keys.mapInPandas(
            _mg_partial_fn(
                key_col,
                m,
                integral_key=key_field.dataType.typeName()
                in ("long", "integer", "short", "byte"),
            ),
            schema=partial_schema,
        )
        .select(key_col)
        .unionByName(null_cand)
        .distinct()
    )
    total = keys.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    cand = F.broadcast(candidates).withColumnRenamed(key_col, "_cand_key")
    return (
        keys.join(cand, F.col(key_col).eqNullSafe(F.col("_cand_key")), "inner")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .join(F.broadcast(total))
        .filter(F.col("cnt") * phi_inv > F.col("_n"))
        .select(key_col, "cnt")
    )
