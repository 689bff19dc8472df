"""Streaming HyperLogLog: the batch estimate's deterministic max-rho
registers maintained incrementally by a native update-mode aggregation.

The batch query (plans/textops.py::token_hll_estimate) reduces the
token stream to a FIXED 4096-register table of max leading-zero ranks.
Registers are pure MAX cells, so — exactly like the count-min twin
(streaming/cms_stream.py) and the quantile twin
(streaming/quantile_stream.py) — the streaming form needs no custom
state operator: hash each arriving document's tokens into their
register with the SAME ``hll_register_entry`` definition and let
Spark's incremental streaming aggregation keep the running maxima.
State is the register table itself (<= 4096 rows regardless of stream
length), each micro-batch touches only the registers its tokens hit,
and max-merge makes re-delivery IDEMPOTENT — replaying the same
documents cannot move a register, a strictly stronger replay posture
than the CMS twin's additive counters. Bit-equality against the batch
registers across arbitrary micro-batch cuts is pinned in
tests/test_hll_stream.py.

This completes the always-on sketch-census trio next to the mediation
stream: frequency (CMS), quantiles (log-grid), cardinality (this).

Reference contract: the analytics/metrics side-outputs of the
mediation service (MediationService.scala windowed counts, SURVEY §2
G2) — the same "cheap always-on census next to the main pipeline"
shape, upgraded to a cardinality sketch.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scio_db_spark.functions import text as X
from scio_db_spark.plans.textops import (
    _HLL_DEN,
    _HLL_LC_THRESHOLD,
    _HLL_M,
    _HLL_NUM,
    hll_register_entry,
)


def streaming_hll_registers(
    stream_df: DataFrame, text_col: str | Column = "text"
) -> DataFrame:
    """Running HLL register table ``(idx, mj)`` for a streaming text
    column. Attach a sink in update output mode; feed the last
    emission per ``idx`` to :func:`hll_estimate` for the running
    cardinality."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    entries = stream_df.select(
        F.explode(X.tokens(col)).alias("token")
    ).select(hll_register_entry(F.col("token")).alias("e"))
    return (
        entries.select("e.idx", "e.rho")
        .groupBy("idx")
        .agg(F.max("rho").alias("mj"))
    )


def hll_estimate(mj_by_idx: dict[int, int]) -> int:
    """Distinct-count estimate from a register table — the EXACT
    integer arithmetic of the batch estimator (same harmonic sum
    scaled by 2^50, same rational alpha_m, same micro-nat quantized
    linear counting), in plain Python so a streaming sink can read the
    running estimate off each update without a Spark job. Feeding the
    batch registers reproduces the batch estimate bit-for-bit
    (tests/test_hll_stream.py)."""
    nregs = len(mj_by_idx)
    v = _HLL_M - nregs
    s = sum(1 << (50 - mj) for mj in mj_by_idx.values()) + v * (1 << 50)
    e_raw = _HLL_NUM // (_HLL_DEN * s)
    if v > 0 and e_raw <= _HLL_LC_THRESHOLD:
        lnm = math.floor(math.log(_HLL_M) * 1_000_000)
        lnv = math.floor(math.log(v) * 1_000_000)
        return (_HLL_M * (lnm - lnv)) // 1_000_000
    return e_raw
