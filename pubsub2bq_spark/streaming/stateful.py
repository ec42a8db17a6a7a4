"""Custom stateful streaming operators (SURVEY.md §2.4 T8).

`running_user_stats` keeps per-user state (event count + value sum)
across micro-batches with ``applyInPandasWithState`` — the arbitrary-
stateful-processing escape hatch for semantics neither windowed aggs
nor dropDuplicates can express (e.g. CDC session enrichment,
per-entity accumulators).

State discipline for 100 TB streams: state is keyed by a bounded-
cardinality column (user/entity id), the value is O(1) per key, and
production deployments pair this with a timeout
(GroupStateTimeout.ProcessingTimeTimeout) to evict idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, batch_events int, total_events int, total_value double"
STATE_SCHEMA = "total_events int, total_value double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    total_events, total_value = (
        state.get if state.exists else (0, 0.0)
    )
    batch_events = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        total_events += len(pdf)
        total_value += float(pdf["value"].sum())
    state.update((total_events, total_value))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "batch_events": [batch_events],
            "total_events": [total_events],
            "total_value": [round(total_value, 4)],
        }
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running totals across micro-batches (update mode)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
