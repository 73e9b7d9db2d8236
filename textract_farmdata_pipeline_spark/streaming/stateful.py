"""Custom stateful streaming operators.

The reference has zero cross-file state (§2.7) — these are the
north-star additions a training-data event pipeline needs:

* :func:`dedup_stream` — streaming exact dedup, state bounded by the
  watermark (the streaming twin of operators.dedup.exact_dedup).
* :func:`user_running_totals_stream` — arbitrary per-key state via
  ``applyInPandasWithState``: a running (count, sum) per user carried
  across micro-batches, the canonical custom-stateful shape
  (enrichment counters, rate limits, session enrichment all reduce to
  it).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_WATERMARK = "2 hours"


def dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Drop duplicate events by key, keeping state only within the
    watermark horizon — at 100 TB/day the dedup state is bounded by
    (key cardinality within the watermark), not the stream's history."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(list(key_cols))


_TOTALS_OUT_SCHEMA = "user_id long, n_events long, total_value double"
_TOTALS_STATE_SCHEMA = "n long, total double"


def user_running_totals_stream(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value sum) across micro-batches.

    One state row (two numbers) per user — O(keys) state regardless of
    stream length; each micro-batch emits the updated totals for the
    users it touched (update output mode).
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            [(user_id, n, total)], columns=["user_id", "n_events", "total_value"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TOTALS_OUT_SCHEMA,
        stateStructType=_TOTALS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class _RunningTotalsProcessor(StatefulProcessor):
    """StatefulProcessor for per-user running totals (Spark 4
    ``transformWithState`` API).

    Same semantics as :func:`user_running_totals_stream`, expressed on
    the newer operator: typed per-key ``ValueState`` backed by the
    RocksDB state store (changelog-checkpointed, state scales to disk
    rather than executor heap), optional per-state TTL instead of a
    single per-operator timeout conf.  Defined at module level so
    cloudpickle ships it by reference with the package, not by value.
    """

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._totals = handle.getValueState(
            "totals", _TOTALS_STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        prev = self._totals.get()
        n, total = prev if prev is not None else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            [(user_id, n, total)], columns=["user_id", "n_events", "total_value"]
        )

    def close(self) -> None:
        pass


class _DedupTtlProcessor(StatefulProcessor):
    """Streaming dedup on ``transformWithState`` with per-key state TTL.

    The TTL twin of :func:`dedup_stream`: ``dropDuplicatesWithinWatermark``
    bounds state by the *event-time* horizon (needs an event-time column
    + watermark), this bounds it by *processing-time* idleness — a key's
    "seen" marker expires ``ttl_ms`` after its last update, so state
    tracks the actively-recurring key set even when event time is absent
    or unordered.  Same trade as reference-free caches everywhere:
    duplicates separated by more than the TTL are re-emitted.
    """

    def __init__(self, ttl_ms: int):
        self._ttl_ms = ttl_ms

    def init(self, handle) -> None:
        self._seen = handle.getValueState(
            "seen", "seen boolean", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        first_batch = self._seen.get() is None
        emitted = False
        for pdf in rows:
            if first_batch and not emitted and len(pdf):
                yield pdf.head(1)
                emitted = True
        self._seen.update((True,))

    def close(self) -> None:
        pass


def dedup_stream_tws(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ttl_ms: int = 3_600_000,
    output_schema: str = "event_id long, ts timestamp, user_id long, value double",
) -> DataFrame:
    """Streaming dedup whose state is TTL-bounded instead of
    watermark-bounded (see :class:`_DedupTtlProcessor`).  Requires the
    RocksDB state store + protobuf, like all transformWithState ops.

    timeMode must be ProcessingTime: TTL'd ValueState is only legal
    there — Spark's StatefulProcessorHandle rejects ttlDurationMs under
    TimeMode.None (STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL),
    and processing-time is what the TTL clock is defined against."""
    proc = _DedupTtlProcessor(ttl_ms)
    return events.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=output_schema,
        outputMode="Append",
        timeMode="ProcessingTime",
    )


def user_running_totals_tws(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Per-user running totals on ``transformWithStateInPandas``.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass``) and the
    ``protobuf`` Python package (the operator's driver-side worker
    speaks protobuf to the JVM); state lives
    off-heap and is changelog-checkpointed, so per-key state survives
    arbitrarily long streams without growing the JVM heap — the 100 TB
    streaming posture.  ``ttl_ms`` expires idle keys' state, bounding
    it by *active* key cardinality.

    With a TTL the timeMode must be ProcessingTime (state TTL is
    illegal under TimeMode.None — the handle throws
    STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL at init);
    without one, TimeMode.None keeps the cheaper no-clock path.
    """
    proc = _RunningTotalsProcessor(ttl_ms)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=_TOTALS_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None" if ttl_ms is None else "ProcessingTime",
    )
