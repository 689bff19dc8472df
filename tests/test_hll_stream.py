"""Streaming HLL registers == batch registers, bit-for-bit, across
arbitrary micro-batch cuts; replay is idempotent (max-merge); the
pure-Python estimator reproduces the registered batch query exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from scio_db_spark.streaming.hll_stream import (
    hll_estimate,
    streaming_hll_registers,
)
from scio_db_spark.streaming.harness import StreamHarness

DOCS = [
    ("the quick brown fox jumps over the lazy dog",),
    ("the cat sat on the mat and the dog barked",),
    ("pack my box with five dozen liquor jugs",),
    ("sphinx of black quartz judge my vow",),
    ("the five boxing wizards jump quickly",),
    ("how vexingly quick daft zebras jump",),
]


def _batch_registers(spark, docs=DOCS):
    from scio_db_spark.functions import text as X
    from scio_db_spark.plans.textops import hll_register_entry

    df = spark.createDataFrame(docs, "text string")
    return {
        r.idx: r.mj
        for r in df.select(
            F.explode(X.tokens(F.col("text"))).alias("token")
        )
        .select(hll_register_entry(F.col("token")).alias("e"))
        .groupBy(F.col("e.idx").alias("idx"))
        .agg(F.max("e.rho").alias("mj"))
        .collect()
    }


def test_streaming_hll_matches_batch_across_cuts(spark):
    expected = _batch_registers(spark)
    h = StreamHarness(spark, "text string")
    h.start(streaming_hll_registers, output_mode="update")
    try:
        # three uneven micro-batch cuts
        h.add_batch(DOCS[:1])
        h.add_batch(DOCS[1:4])
        h.add_batch(DOCS[4:])
        final = {}
        for r in h.results():
            final[r.idx] = r.mj
    finally:
        h.stop()
    assert final == expected
    assert len(final) <= 4096  # state is the register table itself


def test_streaming_hll_replay_is_idempotent(spark):
    """Re-delivering the SAME corpus cannot move a register — max-merge
    absorbs replays entirely (stronger than the CMS twin's doubling)."""
    h = StreamHarness(spark, "text string")
    h.start(streaming_hll_registers, output_mode="update")
    try:
        h.add_batch(DOCS)
        first = {r.idx: r.mj for r in h.results()}
        h.add_batch(DOCS)
        final = dict(first)
        for r in h.results():
            final[r.idx] = r.mj
    finally:
        h.stop()
    assert final == first


def test_estimator_accuracy_on_known_cardinality(spark):
    """4096 registers -> rsd ~1.6%; 5000 distinct tokens must land
    within 3 sigma (~5%)."""
    docs = [
        (" ".join(f"tok{i:05d}" for i in range(k, min(k + 50, 5000))),)
        for k in range(0, 5000, 50)
    ]
    regs = _batch_registers(spark, docs)
    est = hll_estimate(regs)
    assert abs(est - 5000) <= 250


def test_estimator_reproduces_registered_query(spark, sf_dir):
    """hll_estimate(per-lang batch registers) == the registered
    docs_token_hll_estimate output, value-for-value: one arithmetic,
    two packagings."""
    from scio_db_spark.functions import text as X
    from scio_db_spark.plans.catalog import table
    from scio_db_spark.plans.registry import all_queries

    expected = {
        r.lang: (r.distinct_tokens_est, r.zero_registers)
        for r in all_queries()["docs_token_hll_estimate"]
        .spark(spark, sf_dir)
        .collect()
    }
    from scio_db_spark.plans.textops import hll_register_entry

    d = table(spark, sf_dir, "documents")
    rows = (
        d.select("lang", F.explode(X.tokens(F.col("text"))).alias("token"))
        .select("lang", hll_register_entry(F.col("token")).alias("e"))
        .groupBy("lang", F.col("e.idx").alias("idx"))
        .agg(F.max("e.rho").alias("mj"))
        .collect()
    )
    by_lang: dict[str, dict[int, int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.idx] = r.mj
    got = {
        lang: (hll_estimate(regs), 4096 - len(regs))
        for lang, regs in by_lang.items()
    }
    assert got == expected


def test_rollup_merge_equals_direct_registers(spark, sf_dir):
    """The rollup census's day-level max-merge must land on exactly
    the registers a direct (no day split) build produces — the
    mergeability law the pre-aggregated-cube pattern rests on, pinned
    on the real events table."""
    from scio_db_spark.plans.catalog import table
    from scio_db_spark.plans.textops import hll_register_entry

    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        hll_register_entry(F.col("user_id").cast("string")).alias("e"),
    )
    merged = {
        (r.event_type, r.idx): r.mj
        for r in e.groupBy(
            "event_type", "day", F.col("e.idx").alias("idx")
        )
        .agg(F.max("e.rho").alias("mj"))
        .groupBy("event_type", "idx")
        .agg(F.max("mj").alias("mj"))
        .collect()
    }
    direct = {
        (r.event_type, r.idx): r.mj
        for r in e.groupBy("event_type", F.col("e.idx").alias("idx"))
        .agg(F.max("e.rho").alias("mj"))
        .collect()
    }
    assert merged == direct


def test_rollup_estimate_within_rsd(spark, sf_dir):
    """Estimator error on the rollup census stays inside ~3x the
    4096-register rsd (1.6%) against the exact count it carries."""
    from scio_db_spark.plans.registry import all_queries

    rows = (
        all_queries()["events_distinct_users_hll_rollup"]
        .spark(spark, sf_dir)
        .collect()
    )
    assert rows
    for r in rows:
        err = abs(r.distinct_users_est - r.distinct_users_exact)
        assert err <= max(5, 0.05 * r.distinct_users_exact), r
