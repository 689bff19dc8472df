"""int8 embedding quantization: error bounds, plan purity, ANN recall.

No SQL oracle (approximate representation); correctness is pinned by
the reconstruction error bound |err| <= scale/2 per element, exact
agreement with a numpy reference implementation, and a recall floor of
quantized top-k against exact cosine top-k on the real embeddings
table.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from scio_db_spark.operators.quantize import (
    dequantize,
    quantize,
    quantized_dot,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_roundtrip_error_bound_and_numpy_agreement(spark, sf_dir):
    np = pytest.importorskip("numpy")
    q = quantize(_emb(spark, sf_dir), "embedding")
    rows = q.select("vec_id", "embedding", "codes", "scale").collect()
    assert rows
    for r in rows[:100]:
        x = np.asarray(r.embedding, dtype=np.float64)
        scale = max(np.abs(x).max(), 1e-30) / 127.0
        assert abs(r.scale - scale) < 1e-12
        codes = np.asarray(r.codes, dtype=np.int64)
        expect = np.round(x / scale)
        # Spark round() is HALF_UP, numpy rounds half-to-even; ties at
        # .5 are measure-zero for real embeddings but allow 1 code of
        # slack instead of betting on it.
        assert np.max(np.abs(codes - expect)) <= 1
        assert np.abs(codes).max() <= 127
        recon = codes * r.scale
        assert np.max(np.abs(recon - x)) <= scale / 2 + 1e-12


def test_dequantize_column_and_plan_purity(spark, sf_dir):
    q = quantize(_emb(spark, sf_dir), "embedding")
    out = q.withColumn("recon", dequantize("codes", "scale"))
    from scio_db_spark.plans.explain import plan_string

    plan = plan_string(out)
    assert "mapinpandas" not in plan.lower()
    assert "BatchEvalPython" not in plan
    r = out.select("embedding", "recon").first()
    assert len(r.recon) == len(r.embedding)


def test_quantized_topk_recall_floor(spark, sf_dir):
    """Quantized dot-product top-10 must recall most of the exact
    cosine top-10 (per-vector scales cancel only per pair, so this
    exercises the full rescale path)."""
    emb = _emb(spark, sf_dir)
    q = quantize(emb, "embedding")
    queries = q.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("codes").alias("q_codes"),
        F.col("scale").alias("q_scale"),
        F.col("embedding").alias("q_emb"),
    )
    cand = q.select(
        F.col("vec_id").alias("c_id"),
        F.col("codes").alias("c_codes"),
        F.col("scale").alias("c_scale"),
        F.col("embedding").alias("c_emb"),
    )
    joined = queries.join(cand, F.col("q_id") != F.col("c_id"))

    def topk(score_col, k=10):
        from pyspark.sql import Window

        w = Window.partitionBy("q_id").orderBy(
            F.desc(score_col), F.asc("c_id")
        )
        rows = (
            joined.withColumn("s", score_col if isinstance(score_col, F.Column) else F.col(score_col))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("q_id", "c_id")
            .collect()
        )
        out = {}
        for r in rows:
            out.setdefault(r.q_id, set()).add(r.c_id)
        return out

    import math

    def norm_expr(col):
        return F.sqrt(
            F.aggregate(
                F.col(col),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )

    exact_cos = F.aggregate(
        F.zip_with(
            F.col("q_emb"), F.col("c_emb"),
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / (norm_expr("q_emb") * norm_expr("c_emb"))
    approx = quantized_dot("q_codes", "q_scale", "c_codes", "c_scale") / (
        norm_expr("q_emb") * norm_expr("c_emb")
    )
    truth = topk(exact_cos)
    got = topk(approx)
    recalls = [
        len(got.get(qid, set()) & t) / len(t) for qid, t in truth.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    # int8 on near-random 64-dim vectors: measured ~0.9+; floor at 0.7
    # catches a broken rescale outright without flaking on seed drift.
    assert mean_recall >= 0.7, f"quantized recall collapsed: {mean_recall}"


def test_non_finite_elements_yield_null_codes_not_job_abort(spark):
    """Poison rows must stay row-scoped: NaN/Inf elements produce NULL
    codes (try_cast) instead of an ANSI CAST_OVERFLOW aborting the
    whole quantization job; zero vectors quantize to all-zero codes."""
    df = spark.createDataFrame(
        [
            (0, [1.0, float("nan"), 2.0]),
            (1, [float("inf"), 1.0, 2.0]),
            (2, [0.0, 0.0, 0.0]),
            (3, [1.0, -2.0, 0.5]),
        ],
        "id long, vec array<double>",
    )
    rows = {r.id: r for r in quantize(df, "vec").collect()}
    assert None in rows[0].codes  # NaN element → NULL code
    assert None in rows[1].codes  # Inf element → NULL code
    assert rows[2].codes == [0, 0, 0]  # zero vector well-defined
    assert None not in rows[3].codes  # healthy row unaffected
