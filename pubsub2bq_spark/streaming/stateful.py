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


# ---------------------------------------------------------------------------
# Spark 4 transformWithState: the successor API to applyInPandasWithState.
# Typed state variables (ValueState / MapState) replace the single opaque
# state tuple, and the processor object owns its lifecycle (init/close),
# which is what production stateful pipelines need: several independent
# state variables per key, per-variable TTL, and timers — without packing
# everything into one tuple column.
# ---------------------------------------------------------------------------

TWS_OUTPUT_SCHEMA = (
    "user_id bigint, n_event_types bigint, total_events bigint, max_value double"
)


def _profile_processor_cls():
    """Build the StatefulProcessor subclass lazily so importing this
    module never requires the Spark 4 API (older clusters fall back to
    `running_user_stats` above)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class UserProfileProcessor(StatefulProcessor):
        """Per-user profile accumulated across micro-batches with TYPED
        state: a ValueState holding (total_events, max_value) and a
        MapState counting events per event_type — the multi-variable
        layout applyInPandasWithState would force into one tuple.

        Every emitted metric is monotone per key (counts only grow, max
        only rises), so the final update-mode row per user equals the
        one-shot batch aggregate — the SQL-checkable contract.
        """

        def init(self, handle) -> None:
            self._agg = handle.getValueState(
                "agg", "total_events bigint, max_value double"
            )
            self._type_counts = handle.getMapState(
                "type_counts", "event_type string", "n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            total_events, max_value = (
                self._agg.get() if self._agg.exists() else (0, float("-inf"))
            )
            for pdf in rows:
                total_events += len(pdf)
                batch_max = pdf["value"].max()
                if pd.notna(batch_max):
                    max_value = max(max_value, float(batch_max))
                for etype, n in pdf["event_type"].value_counts().items():
                    prev = (
                        self._type_counts.getValue((etype,))[0]
                        if self._type_counts.containsKey((etype,))
                        else 0
                    )
                    self._type_counts.updateValue((etype,), (prev + int(n),))
            self._agg.update((total_events, max_value))
            n_types = sum(1 for _ in self._type_counts.keys())
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_event_types": [n_types],
                    "total_events": [total_events],
                    # -inf = no non-null value seen yet → SQL max() is NULL
                    "max_value": [
                        round(max_value, 4) if max_value != float("-inf") else None
                    ],
                }
            )

        def close(self) -> None:
            pass

    return UserProfileProcessor


def transform_with_state_available() -> bool:
    """transformWithState's state-server protocol speaks protobuf from
    the Python worker; without the `protobuf` package the pre-init
    worker crashes before the first batch. Gate on the import (the
    sandbox container ships PySpark 4.1 but not protobuf)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


# Fallback twin: the SAME per-user profile on applyInPandasWithState,
# with the multi-variable state packed into one tuple (count, max,
# parallel type/count arrays) — exactly the packing transformWithState's
# typed variables exist to remove. Bit-identical output contract.
_PROFILE_STATE_SCHEMA = (
    "total_events bigint, max_value double, etypes array<string>, ecounts array<bigint>"
)


def _profile_update_fallback(key, pdfs, state):
    (user_id,) = key
    if state.exists:
        total_events, max_value, etypes, ecounts = state.get
        counts = dict(zip(list(etypes), [int(c) for c in ecounts]))
    else:
        total_events, max_value, counts = 0, float("-inf"), {}
    for pdf in pdfs:
        total_events += len(pdf)
        batch_max = pdf["value"].max()
        if pd.notna(batch_max):
            max_value = max(max_value, float(batch_max))
        for etype, n in pdf["event_type"].value_counts().items():
            counts[etype] = counts.get(etype, 0) + int(n)
    state.update((total_events, max_value, list(counts), list(counts.values())))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_event_types": [len(counts)],
            "total_events": [total_events],
            "max_value": [
                round(max_value, 4) if max_value != float("-inf") else None
            ],
        }
    )


def user_profile_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user typed-state profile across micro-batches (update mode).

    Uses the Spark 4 transformWithState API when its protobuf dependency
    is importable; otherwise the applyInPandasWithState twin with the
    same output contract (asserted identical by the shared oracle)."""
    if transform_with_state_available():
        return events_stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=_profile_processor_cls()(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _profile_update_fallback,
        TWS_OUTPUT_SCHEMA,
        _PROFILE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
