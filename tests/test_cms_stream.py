"""Streaming CMS counters == batch CMS counters, bit-for-bit, across
arbitrary micro-batch cuts (the repo's standard streaming-twin gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from scio_db_spark.streaming.cms_stream import streaming_cms_counters
from scio_db_spark.streaming.harness import StreamHarness

DOCS = [
    ("the quick brown fox jumps over the lazy dog",),
    ("the cat sat on the mat and the dog barked",),
    ("pack my box with five dozen liquor jugs",),
    ("sphinx of black quartz judge my vow",),
    ("the five boxing wizards jump quickly",),
    ("how vexingly quick daft zebras jump",),
]


def _batch_counters(spark):
    from scio_db_spark.functions import text as X
    from scio_db_spark.plans.textops import cms_cell_array

    df = spark.createDataFrame(DOCS, "text string")
    return {
        (r.i, r.bucket): r.cell
        for r in df.select(F.explode(X.tokens(F.col("text"))).alias("token"))
        .select(F.explode(cms_cell_array(F.col("token"))).alias("c"))
        .groupBy(F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell"))
        .collect()
    }


def test_streaming_cms_matches_batch_across_cuts(spark):
    expected = _batch_counters(spark)
    h = StreamHarness(spark, "text string")
    h.start(streaming_cms_counters, output_mode="update")
    try:
        # three uneven micro-batch cuts
        h.add_batch(DOCS[:1])
        h.add_batch(DOCS[1:4])
        h.add_batch(DOCS[4:])
        # update mode re-emits a cell each time it changes: the LAST
        # emission per (i, bucket) is the running value
        final = {}
        for r in h.results():
            final[(r.i, r.bucket)] = r.cell
    finally:
        h.stop()
    assert final == expected
    # state is the counter table itself: cells, not tokens
    assert len(final) <= 4 * 1024


def test_streaming_cms_state_is_bounded_by_table_size(spark):
    """A second pass of the SAME corpus doubles counts but cannot grow
    the cell set — state is O(D x W), not O(stream)."""
    h = StreamHarness(spark, "text string")
    h.start(streaming_cms_counters, output_mode="update")
    try:
        h.add_batch(DOCS)
        first = {(r.i, r.bucket): r.cell for r in h.results()}
        h.add_batch(DOCS)
        final = {}
        for r in h.results():
            final[(r.i, r.bucket)] = r.cell
    finally:
        h.stop()
    assert set(final) == set(first)
    assert all(final[k] == 2 * first[k] for k in first)


def test_join_size_estimate_upper_bounds_exact(spark, sf_dir):
    """CMS inner-product law: colliding keys only ADD cross terms, so
    the estimate can never undershoot the exact join size — the
    property that makes it safe as a broadcast-vs-shuffle guard
    (an underestimate could pick a broadcast that OOMs)."""
    from scio_db_spark.plans.registry import all_queries

    r = (
        all_queries()["events_orders_join_size_cms"]
        .spark(spark, sf_dir)
        .collect()[0]
    )
    assert r.cms_estimate >= r.exact_join_size
    assert r.overcount == r.cms_estimate - r.exact_join_size
    assert r.exact_join_size > 0  # the join is genuinely non-empty
