"""Library MinHash/LSH entry points (production hash, any DataFrame).

The registry queries (plans/textops.py: docs_minhash_signature,
docs_minhash_lsh_pairs) are pinned to the md5 cross-engine hash so
DuckDB can verify them bit-for-bit. These are the same algorithms as
a reusable API for arbitrary corpora, defaulting to the ~20%-faster
JVM-native xxhash64 (functions/hashing.py::str_hash_fast) — the hash a
real 100 TB run should use, where no oracle constrains the choice.

Shapes are identical to the verified queries: signatures are map-only
(min over a multiset equals min over its set — no explode, no
shuffle); candidate pairs come from an equi-join on (band, band-hash)
keys, never an all-pairs product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scio_db_spark.functions import text as X
from scio_db_spark.functions.hashing import (
    MERSENNE_P,
    minhash_params,
    perm_hash,
    str_hash60,
    str_hash_fast,
)


def shingles_of(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingle strings from an ALREADY-MATERIALIZED token
    array column (empty below n).

    Takes the token column, not the text column, on purpose: a
    non-trivial expression inside a transform lambda is re-evaluated
    once per array ELEMENT (textops.py documents the ~5× measured
    cost), so callers must project tokens into a column first —
    ``minhash_signatures`` below does exactly that."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(toks, i + j) for j in range(n)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    shingle_n: int = 3,
    fast: bool = True,
) -> DataFrame:
    """(id, sig_0..sig_{k-1}) per document — one map-only pass."""
    hasher = str_hash_fast if fast else (
        lambda c: str_hash60(c) % F.lit(MERSENNE_P)
    )
    # Two projection steps: tokens materialize BEFORE the shingle
    # transform references them (else tokenization re-runs per array
    # element — quadratic per doc), then shingle hashes materialize
    # before the k per-permutation mins reference them.
    toks = df.select(
        F.col(id_col), X.tokens(F.col(text_col)).alias("__toks")
    )
    hs = F.transform(shingles_of(F.col("__toks"), shingle_n), hasher)
    sigs = [
        F.array_min(
            F.transform(F.col("__hs"), lambda h: perm_hash(h, a, b))
        ).alias(f"sig_{i}")
        for i, (a, b) in enumerate(minhash_params(k))
    ]
    return toks.select(F.col(id_col), hs.alias("__hs")).select(
        id_col, *sigs
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id_a, id_b) candidate pairs via banded LSH on a signature
    frame from ``minhash_signatures`` — an equi-join on the band key,
    so the pairwise stage is |bucket|-bounded at any scale."""
    if bands <= 0 or k % bands != 0:
        # bands > k would make every band key a constant (a full
        # cross product — the exact blowup banding exists to prevent);
        # a non-divisor would silently drop trailing signatures.
        raise ValueError(
            f"bands must evenly divide k (got k={k}, bands={bands})"
        )
    rows_per_band = k // bands
    band_keys = [
        F.hash(
            F.lit(b),
            *[
                F.col(f"sig_{b * rows_per_band + r}")
                for r in range(rows_per_band)
            ],
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = signatures.select(F.col(id_col), *band_keys)
    pairs = None
    for b in range(bands):
        a = banded.select(
            F.col(id_col).alias("id_a"), F.col(f"band_{b}").alias("__k")
        )
        c = banded.select(
            F.col(id_col).alias("id_b"), F.col(f"band_{b}").alias("__k")
        )
        p = a.join(c, "__k").filter(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b"
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()
