"""Stateful TTL deduplication (D2/D3/D4) on Structured Streaming.

Re-expresses the reference's State & Timer pattern
(``/root/reference/src/main/scala/com.db.myproject/mediation/http/state/StateBaseAsyncDoFn.java:30-34,68-93,156-166``
and ``http/StateAsyncParDoWithHttpHandler.scala:86-95,105-164``) on
``applyInPandasWithState`` with a processing-time timeout:

- first occurrence of a key → emitted ``SENT`` and the send time is
  recorded in per-key state (Beam's ``BagState`` buffered the record,
  but the duplicate check is key-presence only —
  StateAsyncParDoWithHttpHandler.scala:116-120 — so first-send time
  carries the same information);
- repeats while state is live → emitted ``SENT_OR_DUPLICATED``
  (the duplicate contract D4 — duplicates are *emitted*, not dropped);
- the TTL runs from the FIRST send (``ttl.offset(bufferTime).setRelative()``
  on first buffering, StateAsyncParDoWithHttpHandler.scala:86-95);
  duplicates do NOT extend it. Since ``GroupStateTimeout`` resets on
  every invocation, the deadline is re-derived from the stored
  first-send time each time — after expiry the key sends again;
- initial-load rows (D3) — marked by ``initial_col`` — seed state
  without being emitted, mirroring the ``INITIAL_LOAD_`` short-circuit
  (StateAsyncParDoWithHttpHandler.scala:111-113,133-145).

Two interchangeable state APIs, selected by capability:

- ``transformWithStateInPandas`` (Spark 4's preferred API — explicit
  per-key timers via ``registerTimer``, exactly Beam's State & Timer
  shape) when protobuf is importable (its state-server protocol needs
  it);
- ``applyInPandasWithState`` (SURVEY.md §2.5-sanctioned fallback,
  identical observable semantics) otherwise — the only runnable path
  in this environment, which lacks protobuf.

``ttl_dedup(api=...)`` forces either; the default picks by probe.

Scale: state is hash-partitioned by key across executors in the
RocksDB state store — ~1M live keys (BASELINE.md) fits comfortably,
and the TTL timeout bounds state growth.
"""

from __future__ import annotations

import time
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import StructType

from scio_db_spark.schemas import SENT_OR_DUPLICATED

SENT = "SENT"

_STATE_SCHEMA = "first_sent_ms long"


def has_transform_with_state() -> bool:
    """True when ``transformWithStateInPandas`` can actually run: its
    Python worker talks to the JVM state server over protobuf, so the
    API exists but dies at runtime without the package."""
    import importlib.util

    try:
        # find_spec raises when even the parent "google" package is absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def _apply_ttl_gate(
    chunks: list[pd.DataFrame],
    first_sent: int | None,
    now: int,
    order_cols: list[str] | None,
    initial_col: str | None,
) -> tuple[pd.DataFrame | None, int | None]:
    """Shared per-key core of both state APIs: mark SENT /
    SENT_OR_DUPLICATED and advance the first-send watermark.

    All chunks for the key are materialized before ordering: Arrow may
    deliver one key's batch as several DataFrames, and a chunk-local
    sort would let a later chunk hold the globally first-ordered row
    while an earlier chunk gets the SENT mark. Memory is bounded by one
    key's rows in one micro-batch — the same bound as the reference's
    per-key BagState (MediationService pairs it with a pre-state
    ``distinctByKey``; see build_mediation_core, which anti-joins
    historical keys upstream for the same pressure relief).

    Pathological hot key (one key flooding a micro-batch): the bound
    degrades to that batch's row count for the key. Mitigations, in
    preference order: (1) cap the per-trigger volume
    (``maxOffsetsPerTrigger``/``maxFilesPerTrigger``), which caps this
    bound for EVERY key at once; (2) route the caller through
    ``streaming_distinct_by_key`` upstream when within-batch duplicate
    EMISSION (D4) can be traded away — state then sees one row per key
    per watermark window; (3) salting is NOT applicable here — the TTL
    contract is per-key (split keys would each send), which is the
    same reason the reference's BagState carries the identical bound.
    The per-row work below is vectorized, so a hot key costs pandas
    concat + sort, never a Python-loop blowup (pinned by
    test_hot_key_batch_is_bounded_and_correct).
    """
    if not chunks:
        return None, first_sent
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
    if initial_col is not None:
        # NULL flags arrive as float NaN through Arrow→pandas, and
        # NaN.astype(bool) is True — which would silently swallow a
        # live record into the seed branch (never SENT). A null flag
        # means "not an initial-load row": fill False first.
        flags = pdf[initial_col].fillna(False).astype(bool)
        seed = pdf[flags]
        pdf = pdf[~flags]
        if len(seed) and first_sent is None:
            first_sent = now  # D3: seed state, emit nothing
    if order_cols:
        pdf = pdf.sort_values(order_cols)
    if not len(pdf):
        return None, first_sent
    if first_sent is None:
        statuses = [SENT] + [SENT_OR_DUPLICATED] * (len(pdf) - 1)
        first_sent = now
    else:
        statuses = [SENT_OR_DUPLICATED] * len(pdf)
    out = pdf.copy()
    if initial_col is not None:
        out = out.drop(columns=[initial_col])
    out["send_status"] = statuses
    return out, first_sent


def _make_dedup_fn(
    ttl_ms: int,
    order_cols: list[str] | None,
    initial_col: str | None,
    clock_ms=None,
    use_timers: bool = True,
):
    clock_ms = clock_ms or (lambda: int(time.time() * 1000))

    def dedup_fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # W5/onTtl: the timer fired — clear the key's state so the
            # next occurrence sends again (StateBaseAsyncDoFn.java:156-166).
            state.remove()
            return
        now = clock_ms()
        first_sent = state.get[0] if state.exists else None
        if first_sent is not None and now - first_sent >= ttl_ms:
            # Deadline passed but the timeout callback hasn't run yet
            # (timeouts reset on every invocation) — expire inline.
            first_sent = None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out, first_sent = _apply_ttl_gate(
            chunks, first_sent, now, order_cols, initial_col
        )
        if out is not None:
            yield out
        if first_sent is not None:
            state.update((int(first_sent),))
            if use_timers:
                # Re-arm the per-key timer relative to the FIRST send so
                # duplicates never extend the TTL.
                remaining = max(1, first_sent + ttl_ms - now)
                state.setTimeoutDuration(int(remaining))
        elif state.exists:
            # Inline-expired with no new send this batch: GC the key now
            # (the timer would have done this in onTtl).
            state.remove()

    return dedup_fn


class TTLDedupProcessor(StatefulProcessor):
    """``transformWithStateInPandas`` form of the TTL gate (W5/W6).

    Explicit per-key timers (``registerTimer`` at first-send + TTL —
    never re-armed by duplicates) map one-to-one onto the reference's
    ``@TimerId``/``@OnTimer`` pair (StateAsyncParDoWithHttpHandler.
    scala:86-95, StateBaseAsyncDoFn.java:156-166). Requires protobuf
    (see :func:`has_transform_with_state`).
    """

    def __init__(
        self,
        ttl_ms: int,
        order_cols: list[str] | None = None,
        initial_col: str | None = None,
        clock_ms=None,
        use_timers: bool = True,
    ) -> None:
        self._ttl_ms = ttl_ms
        self._order_cols = order_cols
        self._initial_col = initial_col
        self._clock_ms = clock_ms
        self._use_timers = use_timers

    def init(self, handle) -> None:
        self._handle = handle
        self._state = handle.getValueState("first_sent", _STATE_SCHEMA)

    def _now_ms(self, timerValues) -> int:
        if self._clock_ms is not None:
            return self._clock_ms()
        now = timerValues.getCurrentProcessingTimeInMs()
        if now <= 0:
            # timeMode="none" (use_timers=False) reports -1 — fall back
            # to the wall clock so inline TTL expiry still works.
            now = int(time.time() * 1000)
        return now

    def handleInputRows(self, key, rows, timerValues):
        now = self._now_ms(timerValues)
        cur = self._state.get()
        first_sent = cur[0] if cur is not None else None
        had_state = first_sent is not None
        if first_sent is not None and now - first_sent >= self._ttl_ms:
            first_sent = None  # timer not yet fired — expire inline
        live_before = first_sent is not None
        chunks = [pdf for pdf in rows if len(pdf)]
        out, first_sent = _apply_ttl_gate(
            chunks, first_sent, now, self._order_cols, self._initial_col
        )
        if out is not None:
            yield out
        if first_sent is not None:
            if not live_before and self._use_timers:
                # A NEW epoch started (no live state on entry — either
                # a fresh key or an inline expiry): arm the timer
                # relative to this epoch's FIRST send. Duplicates
                # arrive with live_before=True and never re-arm it.
                self._handle.registerTimer(int(first_sent) + self._ttl_ms)
            self._state.update((int(first_sent),))
        elif had_state:
            self._state.clear()

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        # A stale timer from a previous epoch may fire after an inline
        # expiry already started a new epoch — only clear state whose
        # TTL has genuinely elapsed (cf. the hasTimedOut path of the
        # fallback API, which re-derives the deadline the same way).
        cur = self._state.get()
        if cur is not None:
            now = self._now_ms(timerValues)
            if now - cur[0] >= self._ttl_ms:
                self._state.clear()
        return iter(())

    def close(self) -> None:
        pass


def ttl_dedup(
    keyed_df: DataFrame,
    ttl_seconds: float,
    output_schema: str | StructType,
    key_col: str = "idempotent_key",
    order_cols: list[str] | None = None,
    initial_col: str | None = None,
    output_mode: str = "update",
    clock_ms=None,
    use_timers: bool = True,
    api: str = "auto",
) -> DataFrame:
    """Apply the TTL dedup gate to a streaming keyed DataFrame.

    ``output_schema`` = input columns (minus ``initial_col``) plus
    ``send_status string``. ``clock_ms`` is injectable for
    deterministic tests (virtual clock).

    ``api``: ``"auto"`` (transformWithStateInPandas when protobuf is
    present, else applyInPandasWithState), or force either with
    ``"transformWithState"`` / ``"applyInPandasWithState"``.

    ``use_timers=True`` (production, continuous queries) arms a
    per-key processing-time timer that garbage-collects expired state
    (Beam's ``@OnTimer`` clear). Armed timers make Spark schedule
    timer-check micro-batches, which keeps ``Trigger.AvailableNow``
    queries alive — so bounded/test harnesses pass ``use_timers=False``:
    TTL expiry is *also* enforced inline from the stored first-send
    time, so observable SENT / SENT_OR_DUPLICATED semantics are
    identical; only the state-GC mechanism differs (inline removal on
    the key's next visit instead of a background timer).
    """
    if api == "auto":
        api = (
            "transformWithState"
            if has_transform_with_state()
            else "applyInPandasWithState"
        )
    if api == "transformWithState":
        return keyed_df.groupBy(key_col).transformWithStateInPandas(
            statefulProcessor=TTLDedupProcessor(
                int(ttl_seconds * 1000), order_cols, initial_col,
                clock_ms, use_timers,
            ),
            outputStructType=output_schema,
            outputMode=output_mode.capitalize(),
            timeMode="processingTime" if use_timers else "none",
        )
    if api != "applyInPandasWithState":
        raise ValueError(f"unknown state api {api!r}")
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if use_timers
        else GroupStateTimeout.NoTimeout
    )
    return keyed_df.groupBy(key_col).applyInPandasWithState(
        func=_make_dedup_fn(
            int(ttl_seconds * 1000), order_cols, initial_col, clock_ms,
            use_timers,
        ),
        outputStructType=output_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode=output_mode,
        timeoutConf=timeout,
    )
