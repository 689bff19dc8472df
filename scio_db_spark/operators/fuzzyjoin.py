"""Fuzzy string join (edit distance ≤ 1) without a cross product.

The deletion-neighborhood trick (the FastSS family): every string
emits the key set {s} ∪ {s with one character deleted}. Two strings
within Levenshtein distance 1 ALWAYS share a key —

- substitution: both delete the substituted position;
- insertion/deletion: the longer string's deletion equals the shorter
  string itself;
- equality: the identity key.

— so candidate generation is an equi-join on the key (bucket-bounded,
like every pairwise stage in this engine: MinHash bands, SimHash
pigeonholes, LSH cells), and the exact ``levenshtein`` residual (a
JVM built-in) removes the false positives that share a deletion
without being close (e.g. "ab" and "ba" share key "a"... verified
away). No Python anywhere in the plan: variant generation is a
``transform`` over a position sequence.

Scale: keys per string = len+1, so the exploded stream is
O(total characters); hot keys come from very common short strings —
the same Zipf posture as the token joins (pre-aggregate or AQE skew
handling applies). For distance k > 1 the same construction uses
k-deletion neighborhoods; key-set size grows as C(len, k), which is
why the classic recipe stops at 1-2.

Reference parity: no counterpart in the reference engine — dedup
family extension (typo-level near-keys, e.g. idempotency keys mangled
in flight, entity resolution on names).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_keys(col: Column) -> Column:
    """array<string>: the string itself + every 1-deletion variant."""
    s = col
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        # delete position i (1-based): prefix [1, i-1] + suffix [i+1, …]
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1),
            s.substr(i + 1, F.length(s)),
        ),
    )
    return F.array_union(F.array(s), deletions)


def edit1_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """(id_a, id_b, dist) for all pairs within Levenshtein distance 1.

    ``max_distance`` must be 1 (the deletion-neighborhood guarantees
    recall only for distance ≤ 1; the parameter exists so callers make
    the bound explicit)."""
    if max_distance != 1:
        raise ValueError("deletion-neighborhood join covers distance 1")
    keyed = df.select(
        F.col(id_col), F.col(str_col).alias("__s"),
        F.explode(deletion_keys(F.col(str_col))).alias("__k"),
    )
    a = keyed.select(
        F.col(id_col).alias("id_a"), F.col("__s").alias("s_a"), "__k"
    )
    b = keyed.select(
        F.col(id_col).alias("id_b"), F.col("__s").alias("s_b"), "__k"
    )
    return (
        a.join(b, "__k")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()  # strings sharing several keys emit one pair
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .filter(F.col("dist") <= max_distance)
        .select("id_a", "id_b", "dist")
    )
