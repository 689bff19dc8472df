"""Corpus report composition: values cross-checked per signal."""

from __future__ import annotations

from scio_db_spark.operators.report import corpus_report


def test_global_report_values(spark):
    docs = spark.createDataFrame(
        [
            (0, "the fox and the dog run in the field"),
            (1, "the fox and the dog run in the field"),  # exact dup
            (2, "der hund und die katze ist ein tier"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    r = corpus_report(docs, by=None).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_docs == 4
    assert row.n_unique_docs == 3
    assert abs(row.dup_rate - 0.25) < 1e-12
    assert row.n_tokens == 9 + 9 + 8 + 1
    assert row.min_tokens == 1 and row.max_tokens == 9
    assert 0.0 <= row.p10_quality <= row.mean_quality <= 1.0


def test_report_by_inferred_language(spark):
    docs = spark.createDataFrame(
        [
            (0, "the fox and the dog run in the field"),
            (1, "der hund und die katze ist ein tier"),
        ],
        "doc_id long, text string",
    )
    rows = {r.lang: r for r in corpus_report(docs).collect()}
    assert set(rows) == {"en", "de"}
    assert rows["en"].n_docs == 1 and rows["de"].n_docs == 1


def test_report_uses_existing_lang_column(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = corpus_report(docs).collect()
    langs = {r.lang for r in rows}
    # testdata carries its own lang column (incl. zh, which the
    # heuristic lang_id cannot produce) — report must group by it,
    # not re-infer
    assert "zh" in langs
    assert sum(r.n_docs for r in rows) == docs.count()


def test_report_is_one_job_no_python(spark, sf_dir):
    from scio_db_spark.plans.explain import plan_string

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_string(corpus_report(docs))
    assert "BatchEvalPython" not in plan
    assert "mapinpandas" not in plan.lower()
