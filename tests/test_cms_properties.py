"""Property tests for the count-min sketch invariants.

The oracle pins cross-engine bit-equality on the fixed corpus; these
pin the SKETCH-THEORY invariants on arbitrary inputs:
- est(token) >= true count, always (min over cells can only overcount);
- the counter table never exceeds D x W cells;
- counters built from two disjoint halves MERGE by cell-wise addition
  into exactly the full-corpus counters (the mergeability that makes
  the sketch a map-side partial at 100 TB).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from scio_db_spark.plans.textops import _CMS_D, _CMS_W, cms_cell_array

_word = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x24F),
    min_size=1,
    max_size=8,
)


def _counters(spark, words):
    if not words:
        return {}
    df = spark.createDataFrame([(w,) for w in words], "token string")
    return {
        (r.i, r.bucket): r.cell
        for r in df.select(
            F.explode(cms_cell_array(F.col("token"))).alias("c")
        )
        .groupBy(F.col("c.i").alias("i"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell"))
        .collect()
    }


def _estimate(spark, counters, token):
    row = (
        spark.createDataFrame([(token,)], "token string")
        .select(F.explode(cms_cell_array(F.col("token"))).alias("c"))
        .select("c.i", "c.bucket")
        .collect()
    )
    return min(counters.get((r.i, r.bucket), 0) for r in row)


@settings(max_examples=5, deadline=None)
@given(st.lists(_word, min_size=1, max_size=60))
def test_cms_never_undercounts_and_merges(spark, words):
    true = Counter(words)
    full = _counters(spark, words)
    assert len(full) <= _CMS_D * _CMS_W
    # overestimate-only, for every distinct token
    for tok, n in true.items():
        assert _estimate(spark, full, tok) >= n
    # mergeability: counters(half1) + counters(half2) == counters(all)
    mid = len(words) // 2
    merged = Counter()
    for part in (words[:mid], words[mid:]):
        merged.update(_counters(spark, part))
    assert dict(merged) == full
