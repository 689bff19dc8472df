"""Streaming KMV bottom-k == batch bottom-k, bit-for-bit, across
arbitrary micro-batch cuts; replay is idempotent (min-merge); the
pure-Python pair estimator reproduces the registered batch census's
integers exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from scio_db_spark.functions.hashing import str_hash60
from scio_db_spark.plans.mediation import _KMV_K
from scio_db_spark.streaming.harness import StreamHarness
from scio_db_spark.streaming.kmv_stream import (
    kmv_pair_estimate,
    streaming_kmv_sketch,
)

# (day, user) events: day "a" has users 0..199, day "b" 100..299 —
# a 100-user true intersection, enough rows that K=128 truncation
# actually bites on each day.
ROWS = [("a", u) for u in range(200)] + [("b", u) for u in range(100, 300)]


def _hashed_rows(spark, rows):
    df = spark.createDataFrame(rows, "day string, user_id long")
    return [
        (r.day, r.h)
        for r in df.select(
            "day",
            str_hash60(F.col("user_id").cast("string")).alias("h"),
        ).collect()
    ]


def _batch_sketch(spark, rows):
    hashed = _hashed_rows(spark, rows)
    out: dict[str, list[int]] = {}
    for day, h in hashed:
        out.setdefault(day, []).append(h)
    return {
        d: sorted(set(hs))[:_KMV_K] for d, hs in out.items()
    }


def _latest_per_day(results):
    latest = {}
    for r in results:  # update mode: last emission per day wins
        latest[r.day] = list(r.ks)
    return latest


def test_streaming_kmv_matches_batch_across_cuts(spark):
    expected = _batch_sketch(spark, ROWS)
    hashed = _hashed_rows(spark, ROWS)
    h = StreamHarness(spark, "day string, h long")
    h.start(streaming_kmv_sketch, output_mode="update")
    # adversarial cut: interleave days across three micro-batches
    h.add_batch(hashed[::3])
    h.add_batch(hashed[1::3])
    h.add_batch(hashed[2::3])
    got = _latest_per_day(h.results())
    h.stop()
    assert got == expected
    assert all(len(ks) <= _KMV_K for ks in got.values())


def test_replay_is_idempotent(spark):
    hashed = _hashed_rows(spark, ROWS)
    h = StreamHarness(spark, "day string, h long")
    h.start(streaming_kmv_sketch, output_mode="update")
    h.add_batch(hashed)
    first = _latest_per_day(h.results())
    h.add_batch(hashed)  # full replay: min-merge must not move
    second = _latest_per_day(h.results())
    h.stop()
    assert first == second


def test_pair_estimator_reproduces_registered_census(spark, sf_dir):
    """Feed the BATCH census's own day sketches to the plain-Python
    estimator: every reported integer must match the registered
    query's columns (one cell definition, two runtimes)."""
    from scio_db_spark.plans.catalog import table
    from scio_db_spark.plans.registry import all_queries

    e = table(spark, sf_dir, "events")
    dh = e.select(
        F.to_date("ts").cast("string").alias("day"),
        str_hash60(F.col("user_id").cast("string")).alias("h"),
    ).distinct()
    sketches = {
        r.day: sorted(r.hs)[:_KMV_K]
        for r in dh.groupBy("day")
        .agg(F.collect_set("h").alias("hs"))
        .collect()
    }
    census = (
        all_queries()["events_user_overlap_kmv_census"]
        .spark(spark, sf_dir)
        .collect()
    )
    assert census
    for r in census[:50]:
        est = kmv_pair_estimate(sketches[r.day_a], sketches[r.day_b])
        assert est["k_used"] == r.k_used, (r.day_a, r.day_b)
        assert est["jac_num"] == r.jac_num
        assert est["union_est"] == r.union_est
        assert est["inter_est"] == r.inter_est


def test_per_chunk_trim_is_lossless(spark):
    """ADVICE-r10 regression: the state update trims to the k smallest
    after EVERY pandas chunk (bounded working set). Min-merge is
    associative, so chunk-wise trimming must still produce the exact
    global bottom-k — including when a LATER chunk delivers hashes
    smaller than every survivor of the first chunk."""
    import pandas as pd

    from scio_db_spark.streaming.kmv_stream import _make_kmv_fn

    class FakeState:
        exists = False

        def update(self, t):
            self.exists = True
            self.get = t

    k = 8
    # chunk 1: large hashes; chunk 2: strictly smaller ones that must
    # displace every chunk-1 survivor; chunk 3: interleaved + dups
    chunks = [
        pd.DataFrame({"h": [1000 + i for i in range(50)]}),
        pd.DataFrame({"h": [i for i in range(20)]}),
        pd.DataFrame({"h": [5, 7, 9, 2000, 3, 3]}),
    ]
    st = FakeState()
    list(_make_kmv_fn(k)(("d",), iter(chunks), st))
    everything = {int(h) for c in chunks for h in c["h"]}
    assert list(st.get[0]) == sorted(everything)[:k]
