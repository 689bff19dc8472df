"""Streaming bloom filter: the membership screen's word table
maintained incrementally by a native update-mode aggregation.

Bloom words are pure bit_or cells, so — like the CMS counters
(cms_stream.py), the log-grid histogram (quantile_stream.py), and the
HLL registers (hll_stream.py) — the streaming form needs no custom
state operator: explode each arriving document's K bit positions with
the SAME ``bloom_bits_from_hash`` definition and let Spark's
incremental aggregation keep the running masks. State is the word
table itself (<= m/32 rows regardless of stream length), bit_or makes
re-delivery IDEMPOTENT (replaying a document cannot set a bit twice),
and the final words are BIT-EQUAL to the batch build across arbitrary
micro-batch cuts (tests/test_bloom_stream.py).

This is the live incremental-crawl screen: the filter keeps absorbing
today's documents while a snapshot of the word table (a 32-row
broadcast) screens every new batch — and because words merge by
bit_or, the streaming state unions with any offline-built filter for
free.

With this, all four deterministic sketches (frequency, quantiles,
cardinality, membership) have the same pair of forms: a
hash-verifiable batch census and a native update-mode streaming twin
sharing one cell definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scio_db_spark.functions.hashing import str_hash60
from scio_db_spark.plans.textops import _BLOOM_WORD, bloom_bits_from_hash


def streaming_bloom_words(
    stream_df: DataFrame, key_col: str | Column = "text"
) -> DataFrame:
    """Running bloom word table ``(w, mask)`` for a streaming string
    key column. Attach a sink in update output mode; the last emission
    per ``w`` IS the filter."""
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    bits = stream_df.select(
        F.explode(bloom_bits_from_hash(str_hash60(col))).alias("bit")
    )
    return bits.groupBy(F.expr(f"bit DIV {_BLOOM_WORD}").alias("w")).agg(
        F.expr(
            f"bit_or(shiftleft(1L, CAST(bit % {_BLOOM_WORD} AS INT)))"
        ).alias("mask")
    )
