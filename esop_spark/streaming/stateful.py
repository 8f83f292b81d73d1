"""Custom stateful streaming operators via applyInPandasWithState.

The reference's incremental behaviors keep per-key state across invocations
(in-flight upload tracking, AbstractTracker.java:95-168; session progress
counters :362-367). In Structured Streaming that pattern is an arbitrary
stateful operator: Arrow-batched per-key state with checkpoint-backed
fault tolerance.

``running_user_counts`` is the canonical shape: per-key accumulator that
survives micro-batches AND query restarts (state lives in the checkpoint).
Custom session windows, dedup-with-TTL, and progress trackers are the same
skeleton with different state schemas.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_COUNT_OUTPUT = "user_id bigint, total_events bigint, total_value double"
RUNNING_COUNT_STATE = "count bigint, value_sum double"


def _count_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cnt, vsum = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        cnt += len(pdf)
        vsum += float(pdf["value"].sum())
    state.update((cnt, vsum))
    yield pd.DataFrame(
        {"user_id": [key[0]], "total_events": [cnt], "total_value": [vsum]}
    )


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) over an event stream.

    State is per-key and checkpoint-backed: a restarted query resumes the
    accumulators instead of recounting (exactly-once state semantics).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _count_fn,
        outputStructType=RUNNING_COUNT_OUTPUT,
        stateStructType=RUNNING_COUNT_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
