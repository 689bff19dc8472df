"""Streaming KMV bottom-k sketch: the batch day-sketch maintained
incrementally with BOUNDED state.

The batch census (plans/mediation.py::events_user_overlap_kmv_census)
reduces each day to its K smallest md5-derived hashes. Unlike the
max-cell sketches (CMS/HLL/quantile twins), bottom-k cannot ride a
native streaming aggregation without unbounded state — ``collect_set``
would retain EVERY distinct hash per day, defeating the sketch. So
this twin uses the keyed-state operator
(``applyInPandasWithState``, the ttl_dedup pattern): per day, state is
exactly one sorted array of at most K longs; each micro-batch merges
the arriving hashes and keeps the K smallest. Min-merge makes
re-delivery IDEMPOTENT — replaying records cannot change the bottom-k
(same replay posture as the HLL twin's max registers).

One cell definition, shared: the hash is the batch query's
``str_hash60`` and the sketch is "K smallest distinct", so a stream
cut at ANY micro-batch boundary yields bit-identical day sketches to
the batch build (pinned in tests/test_kmv_stream.py), and
:func:`kmv_pair_estimate` reproduces the registered census's
union/intersection integers from any two sketches in plain Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from scio_db_spark.plans.mediation import _KMV_K, _KMV_SCALE

_STATE_SCHEMA = "ks array<long>"
_OUT_SCHEMA = "day string, ks array<long>"


def _make_kmv_fn(k: int):
    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (day,) = key
        ks: list[int] = list(state.get[0]) if state.exists else []
        for pdf in pdfs:
            merged = set(ks)
            merged.update(int(h) for h in pdf["h"] if h is not None)
            # trim to the k smallest PER CHUNK, not once at the end:
            # min-merge is associative (anything dropped is larger
            # than k survivors and can never re-enter the bottom-k),
            # so the working set stays O(k + chunk) instead of
            # O(batch distinct) on a hot day (ADVICE r10)
            ks = sorted(merged)[:k]
        state.update((ks,))
        yield pd.DataFrame({"day": [day], "ks": [ks]})

    return update


def streaming_kmv_sketch(
    keyed_df: DataFrame,
    k: int = _KMV_K,
    day_col: str = "day",
    hash_col: str = "h",
) -> DataFrame:
    """Running bottom-k sketch per day for a streaming ``(day, h)``
    frame (update output mode): emits the day's full refreshed sketch
    each micro-batch it is touched. State per day = one array of at
    most ``k`` longs."""
    df = keyed_df.selectExpr(
        f"{day_col} AS day", f"{hash_col} AS h"
    )
    return df.groupBy("day").applyInPandasWithState(
        func=_make_kmv_fn(k),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_pair_estimate(
    ks_a: list[int], ks_b: list[int], k: int = _KMV_K
) -> dict[str, int]:
    """Union / Jaccard-numerator / intersection estimates for two
    bottom-k sketches — the EXACT integer arithmetic of the batch
    census (same floor divisions), in plain Python so a streaming
    sink can answer overlap questions off the running sketches
    without a Spark job."""
    merged = sorted(set(ks_a) | set(ks_b))
    union_k = merged[:k]
    k_used = min(k, len(merged))
    sa, sb = set(ks_a), set(ks_b)
    jac_num = sum(1 for x in union_k if x in sa and x in sb)
    if len(merged) >= k:
        union_est = ((k - 1) * _KMV_SCALE) // merged[k - 1]
    else:
        union_est = len(merged)
    inter_est = (jac_num * union_est) // max(k_used, 1)
    return {
        "k_used": k_used,
        "jac_num": jac_num,
        "union_est": union_est,
        "inter_est": inter_est,
    }
