"""Bloom membership screen laws: no false negatives (ever), measured
FP rate near theory, bit_or mergeability, fixed state size."""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from scio_db_spark.plans.textops import (
    _BLOOM_BITS,
    _BLOOM_K,
    _BLOOM_WORD,
    bloom_build,
    bloom_probe,
)


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_no_false_negatives(spark):
    """Every key that went INTO the filter must probe positive — the
    bloom law the screen's correctness rests on (a false negative
    silently drops a true duplicate from the dedup path)."""
    hist = [f"doc-{i}-{i * i}" for i in range(300)]
    words = bloom_build(_keys_df(spark, hist), "key")
    probed = bloom_probe(_keys_df(spark, hist), words, "key")
    assert probed.filter(F.col("bloom_hit") == 0).count() == 0


def test_fp_rate_near_theory(spark):
    """Non-members hit at ~the textbook rate for (m, k, n) — the
    committed undersized filter must produce MEASURABLE FPs (that is
    its job at the gate SF), but not wildly more than theory."""
    n = 300
    hist = [f"doc-{i}-{i * i}" for i in range(n)]
    fresh = [f"other-{i}-{i * 7}" for i in range(2000)]
    words = bloom_build(_keys_df(spark, hist), "key")
    fp = (
        bloom_probe(_keys_df(spark, fresh), words, "key")
        .filter(F.col("bloom_hit") == 1)
        .count()
    )
    rate = fp / 2000
    fill = 1.0 - math.exp(-_BLOOM_K * n / _BLOOM_BITS)
    theory = fill**_BLOOM_K
    assert 0 < rate < 2.5 * theory, (rate, theory)


def test_word_table_is_fixed_and_mergeable(spark):
    """State is bounded by construction (m / word-size rows) and two
    filters merge by union + bit_or regroup — the incremental-crawl
    property: daily filters combine without touching any key."""
    a = [f"a-{i}" for i in range(200)]
    b = [f"b-{i}" for i in range(200)]
    wa = bloom_build(_keys_df(spark, a), "key")
    wb = bloom_build(_keys_df(spark, b), "key")
    assert wa.count() <= _BLOOM_BITS // _BLOOM_WORD
    merged = (
        wa.unionByName(wb)
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("mask"))
    )
    direct = bloom_build(_keys_df(spark, a + b), "key")
    assert {(r.w, r.mask) for r in merged.collect()} == {
        (r.w, r.mask) for r in direct.collect()
    }


def test_census_false_positive_accounting(spark, sf_dir):
    """Registered census invariants: exact duplicates are a subset of
    bloom positives (no-false-negative law on real data), and
    false_positive is exactly their difference."""
    from scio_db_spark.plans.registry import all_queries

    rows = (
        all_queries()["docs_bloom_membership_census"]
        .spark(spark, sf_dir)
        .collect()
    )
    assert rows
    for r in rows:
        assert r.exact_duplicate <= r.bloom_positive
        assert r.false_positive == r.bloom_positive - r.exact_duplicate


def test_probe_bits_mismatch_raises_at_plan_time(spark):
    """Probing a bloom_build_sized(bits=4096) table with the default
    bits recomputes different bit positions and can silently return
    false negatives (round-9 ADVICE): the build-time bloom_bits stamp
    must make the mismatch raise before anything executes."""
    from scio_db_spark.plans.textops import bloom_build_sized

    words = bloom_build_sized(_keys_df(spark, ["k1", "k2"]), "key", 4096)
    with pytest.raises(ValueError, match="built with bits=4096"):
        bloom_probe(_keys_df(spark, ["k1"]), words, "key")  # default bits


def test_probe_matching_bits_passes_stamp_check(spark):
    from scio_db_spark.plans.textops import bloom_build_sized

    hist = ["a", "b", "c"]
    words = bloom_build_sized(_keys_df(spark, hist), "key", 4096)
    got = {
        r.key: r.bloom_hit
        for r in bloom_probe(
            _keys_df(spark, hist), words, "key", bits=4096
        ).collect()
    }
    assert got == {k: 1 for k in hist}  # no false negatives


def test_probe_unstamped_oversized_table_fails_loudly(spark):
    """A hand-built word table without the metadata stamp whose word
    indexes exceed the probe's range (build bits > probe bits) must
    raise at execution via the runtime guard, not silently miss."""
    import pyspark.sql.utils as _u  # noqa: F401

    from scio_db_spark.plans.textops import _BLOOM_BITS, _BLOOM_WORD

    n_words = _BLOOM_BITS // _BLOOM_WORD
    words = spark.createDataFrame(
        [(n_words + 5, 123)], "w long, mask long"
    )
    with pytest.raises(Exception, match="out of range|mismatch"):
        bloom_probe(_keys_df(spark, ["x"]), words, "key").collect()
