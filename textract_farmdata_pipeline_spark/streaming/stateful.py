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
