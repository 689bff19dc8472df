"""Hashed-feature quality classifier: cross-SF agreement with the
distilled heuristic, and one scoring definition across the library
column and the registered census."""

from __future__ import annotations

from pyspark.sql import functions as F

from scio_db_spark.functions import text as X
from scio_db_spark.plans.catalog import table
from scio_db_spark.plans.textops import (
    _QCLF_BIAS,
    _QCLF_DIM,
    _QCLF_W,
    quality_clf_score,
)


def test_agreement_with_heuristic_on_unseen_sf(spark, sf_dir):
    """The model was trained at sf0.1; at the gate SF (unseen) its
    predictions must still agree with the heuristic labels it
    distilled — the filter is useful, not memorized. Measured 98.6%
    at sf0.01; pinned with slack."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        X.tokens(F.col("text")).alias("toks"),
        (X.quality_score(F.col("text")) >= 0.6).cast("int").alias("y"),
    )
    scored = d.select(
        "y", (quality_clf_score(F.col("toks")) >= 0).cast("int").alias("p")
    )
    agree = scored.select(
        F.avg((F.col("y") == F.col("p")).cast("double")).alias("a")
    ).collect()[0].a
    assert agree >= 0.95, agree


def test_score_column_matches_census_path(spark, sf_dir):
    """quality_clf_score (fold over the token array) and the census's
    explode+sum+bias path are the same arithmetic — two plan shapes,
    one model."""
    from scio_db_spark.functions.hashing import str_hash60

    d = table(spark, sf_dir, "documents").limit(200)
    via_fold = {
        r.doc_id: r.s
        for r in d.select(
            "doc_id", X.tokens(F.col("text")).alias("toks")
        )
        .select("doc_id", quality_clf_score(F.col("toks")).alias("s"))
        .collect()
    }
    warr = F.array(*[F.lit(v).cast("long") for v in _QCLF_W])
    tok = d.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("token")
    )
    per = (
        tok.select(
            "doc_id",
            F.element_at(
                warr,
                (str_hash60(F.col("token")) % _QCLF_DIM).cast("int") + 1,
            ).alias("wt"),
        )
        .groupBy("doc_id")
        .agg((F.sum("wt") + F.lit(_QCLF_BIAS)).alias("s"))
    )
    via_explode = {r.doc_id: r.s for r in per.collect()}
    for doc_id, s in via_fold.items():
        assert via_explode.get(doc_id, _QCLF_BIAS) == s


def test_model_is_discriminative_not_constant(spark, sf_dir):
    """Census sanity: both classes occur at the gate SF (a constant
    predictor would trivially 'agree' if classes were imbalanced)."""
    from scio_db_spark.plans.registry import all_queries

    rows = (
        all_queries()["docs_quality_classifier_census"]
        .spark(spark, sf_dir)
        .collect()
    )
    total = sum(r.n_docs for r in rows)
    high = sum(r.n_pred_high for r in rows)
    assert 0 < high < total


def test_calibration_ece_below_bound(spark):
    """Expected calibration error from the reliability census's exact
    integers: per decile, |sigmoid(mean logit) - observed heuristic-
    label rate|, doc-weighted. Measured 0.016 (sf0.001) / 0.026
    (sf0.01) at freeze time — a miscalibrated filter would silently
    shift corpus mixture at 100 TB, so the bound is a release gate,
    not an observation (round-9 verdict item 5)."""
    import math

    from scio_db_spark.plans.textops import quality_clf_calibration_census

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = quality_clf_calibration_census(spark, sf).collect()
        n_total = sum(r.n_docs for r in rows)
        assert n_total > 0 and len(rows) == 10
        ece = 0.0
        for r in rows:
            mean_logit = r.sum_score / r.n_docs / (1 << 16)
            pred = 1.0 / (1.0 + math.exp(-mean_logit))
            rate = r.n_label_high / r.n_docs
            ece += (r.n_docs / n_total) * abs(pred - rate)
        assert ece < 0.08, f"{sf}: ECE {ece:.4f} exceeds bound"
