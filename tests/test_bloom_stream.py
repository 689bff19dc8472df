"""Streaming bloom words == batch bloom words, bit-for-bit, across
arbitrary micro-batch cuts; replay is idempotent (bit_or)."""

from __future__ import annotations

from scio_db_spark.plans.textops import _BLOOM_BITS, _BLOOM_WORD, bloom_build
from scio_db_spark.streaming.bloom_stream import streaming_bloom_words
from scio_db_spark.streaming.harness import StreamHarness

KEYS = [(f"doc-{i}-{i * i}",) for i in range(120)]


def _batch_words(spark, keys=KEYS):
    df = spark.createDataFrame(keys, "text string")
    return {(r.w, r.mask) for r in bloom_build(df, "text").collect()}


def test_streaming_bloom_matches_batch_across_cuts(spark):
    expected = _batch_words(spark)
    h = StreamHarness(spark, "text string")
    h.start(streaming_bloom_words, output_mode="update")
    try:
        h.add_batch(KEYS[:7])
        h.add_batch(KEYS[7:60])
        h.add_batch(KEYS[60:])
        final = {}
        for r in h.results():
            final[r.w] = r.mask
    finally:
        h.stop()
    assert set(final.items()) == expected
    assert len(final) <= _BLOOM_BITS // _BLOOM_WORD


def test_streaming_bloom_replay_is_idempotent(spark):
    h = StreamHarness(spark, "text string")
    h.start(streaming_bloom_words, output_mode="update")
    try:
        h.add_batch(KEYS)
        first = {r.w: r.mask for r in h.results()}
        h.add_batch(KEYS)
        final = dict(first)
        for r in h.results():
            final[r.w] = r.mask
    finally:
        h.stop()
    assert final == first
