"""Streaming SCD Type-2: closed version rows emitted as changes arrive.

The streaming twin of ``operators/scd2.scd2_from_log`` under the same
contract family as ``streaming/anomaly.py``: fed the same rows in the
same order, the stream's emitted rows are EXACTLY the batch plan's
closed history (``is_current = false`` rows) — run boundaries are a
pure function of the row sequence, so micro-batch placement cannot
move them (pinned in tests/test_scd2_stream.py).

Semantics per key, identical to the batch form:

- a change is ``attr IS DISTINCT FROM previous attr`` (null-safe, so
  NULL is a trackable state, not a change-on-every-row);
- versions number runs in event order, starting at 1 — except a
  leading NULL-attr run, which gets 0 (the batch lag-vs-NULL edge,
  reproduced bit-for-bit rather than papered over);
- when a change arrives, the PREVIOUS run closes with ``valid_to`` =
  the change row's timestamp and is emitted; the open run lives only
  in state (append output mode — emitted rows are immutable history,
  never retracted).

State is one open run per key: (attr, valid_from µs, version,
n_events) — cardinality-bounded by the dimension key space, the SCD2
contract. Deliberately NO idle eviction (unlike anomaly's optional
TTL): evicting an open run would restart version numbering and emit a
duplicate version on the key's return; a dimension whose key space
needs eviction wants the dedup TTL operator, not change history.

Timestamps cross the state boundary as int64 epoch-microseconds (the
state store schema is primitive-typed); outputs restore proper
timestamps.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "attr string, valid_from_us long, version long, n long"


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1_000)


def _make_scd2_fn(attr_col: str, ts_col: str, tie_col: str):
    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values([ts_col, tie_col], kind="mergesort")
        if state.exists:
            cur_attr, cur_from_us, version, n = state.get
        else:
            cur_attr, cur_from_us, version, n = None, None, 0, 0
        out_state, out_ver, out_from, out_to, out_n = [], [], [], [], []
        for attr, ts in zip(rows[attr_col], rows[ts_col]):
            attr = None if pd.isna(attr) else attr
            if cur_from_us is None:
                # first row ever for this key: version 1, except the
                # batch plan's leading-NULL edge (lag NULL not
                # DISTINCT FROM attr NULL -> no change flag) = 0
                version = 0 if attr is None else 1
                cur_attr, cur_from_us, n = attr, _us(ts), 1
            elif (attr is None) != (cur_attr is None) or attr != cur_attr:
                out_state.append(cur_attr)
                out_ver.append(version)
                out_from.append(cur_from_us)
                out_to.append(_us(ts))
                out_n.append(n)
                version += 1
                cur_attr, cur_from_us, n = attr, _us(ts), 1
            else:
                n += 1
        if cur_from_us is not None:
            state.update((cur_attr, cur_from_us, version, n))
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(out_ver),
                "version": pd.Series(out_ver, dtype="int64"),
                "state": pd.Series(out_state, dtype="object"),
                "valid_from": pd.to_datetime(
                    pd.Series(out_from, dtype="int64"), unit="us"
                ),
                "valid_to": pd.to_datetime(
                    pd.Series(out_to, dtype="int64"), unit="us"
                ),
                "n_events": pd.Series(out_n, dtype="int64"),
            }
        )

    return fn


def scd2_stream(
    stream_df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tie_col: str,
) -> DataFrame:
    """Emit closed SCD2 version rows as attribute changes arrive.

    Output: (key, version, state, valid_from, valid_to, n_events) —
    append mode; equals the batch ``scd2_from_log`` rows with
    ``is_current = false`` for the same row order. The key column is
    emitted under the name ``key`` (state-function output schemas are
    positional); rename downstream if the original name matters.
    """
    key_field = stream_df.schema[key_col]
    out_schema = (
        f"key {key_field.dataType.simpleString()}, version long, "
        "state string, valid_from timestamp, valid_to timestamp, "
        "n_events long"
    )
    return stream_df.groupBy(key_col).applyInPandasWithState(
        func=_make_scd2_fn(attr_col, ts_col, tie_col),
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
