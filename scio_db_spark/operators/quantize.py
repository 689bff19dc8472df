"""Scalar int8 quantization for embedding columns.

At 100 TB the embedding table's float32 payload dominates ANN cost:
8-bit symmetric quantization cuts the stored/shuffled bytes 4× and the
candidate-scoring memory traffic with it, at a bounded dot-product
error — the standard first rung of the compression ladder under IVF
(IVF cells from `operators/kmeans.py`, exact re-rank on the float
vectors only for the final candidates).

Everything here is pure Column expressions (transform / zip_with /
aggregate inside whole-stage codegen — no Python in any plan):

- ``quantize``: per-vector symmetric scale ``max|x| / 127``, codes in
  [-127, 127] stored as array<tinyint> + one float scale per row.
  Per-vector scaling is deliberate: corpus-level scales need a global
  pass and break on outliers; per-row max is map-only and keeps the
  error bound local (|err| ≤ scale/2 per element).
- ``dequantize``: codes × scale.
- ``quantized_dot``: integer dot of two code arrays rescaled by both
  scales — the ANN candidate scorer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_QMAX = 127


def quantize(
    df: DataFrame,
    vec_col: str,
    code_col: str = "codes",
    scale_col: str = "scale",
) -> DataFrame:
    """Append ``code_col`` (array<tinyint>) + ``scale_col`` (double)."""
    v = F.col(vec_col)
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-30),  # all-zero vectors quantize to zeros, scale stays finite
    ) / F.lit(float(_QMAX))
    return df.withColumn(scale_col, scale).withColumn(
        code_col,
        F.transform(
            v,
            # try_cast, not cast: a NaN/Inf element must yield a NULL
            # code, not abort the whole job with an ANSI CAST_OVERFLOW
            # (non-finite embeddings are a caller bug — emb_norms
            # surfaces them — but a poison row must stay row-scoped).
            lambda x: F.round(x.cast("double") / F.col(scale_col)).try_cast(
                "tinyint"
            ),
        ),
    )


def dequantize(code_col: str, scale_col: str) -> Column:
    """array<double> reconstruction: codes × scale."""
    return F.transform(
        F.col(code_col),
        lambda c: c.cast("double") * F.col(scale_col),
    )


def quantized_dot(
    codes_a: str, scale_a: str, codes_b: str, scale_b: str
) -> Column:
    """Approximate dot product: int accumulation, one float rescale.

    The integer sum fits long comfortably (dim × 127² ≤ 1.0e6 at
    dim=64); the single final multiply keeps float work per candidate
    to O(1) instead of O(dim)."""
    int_dot = F.aggregate(
        F.zip_with(
            F.col(codes_a),
            F.col(codes_b),
            lambda a, b: a.cast("long") * b.cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return int_dot.cast("double") * F.col(scale_a) * F.col(scale_b)
