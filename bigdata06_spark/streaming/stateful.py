"""Custom stateful streaming operator via applyInPandasWithState:
per-user running totals maintained in the state store across
micro-batches (the template for any custom accumulating operator the
built-in aggregations can't express).

State schema is explicit (`n long, total double`); output is one row
per user per batch with the cumulative values. Arrow-batched; state is
partitioned by the group key, so scale-out is the same hash shuffle as
a streaming aggregation.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------- transformWithStateInPandas


TWS_OUTPUT_SCHEMA = "user_id long, n_events long, max_value double"


def _user_peak_processor():
    """StatefulProcessor (Spark 4 `transformWithStateInPandas` — the
    successor API to applyInPandasWithState): typed per-key state
    handles (ValueState here; ListState/MapState/timers available),
    explicit lifecycle (init/handleInputRows/close), RocksDB-backed.
    Built lazily: the class references the active session's serializers
    at definition time."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    class UserPeak(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType(
                [StructField("n", LongType()), StructField("mx", DoubleType())]
            )
            self._state = handle.getValueState("peak", schema)

        def handleInputRows(self, key, rows, timerValues):
            n, mx = (0, float("-inf"))
            if self._state.exists():
                n, mx = self._state.get()
            for pdf in rows:
                n += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, mx))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
            )

        def close(self) -> None:
            pass

    return UserPeak()


def user_peak_totals(events: DataFrame) -> DataFrame:
    """Per-user event count + running max via transformWithStateInPandas.
    Requires the RocksDB state store provider AND `protobuf` (the
    API's state round-trip wire format) — satisfied here by the
    vendored pure-Python runtime (see compat.py), activated for this
    session's workers before the plan is built. Output mode Update —
    one row per seen user per batch with the cumulative values;
    `running_user_totals` (applyInPandasWithState) is the
    protobuf-free equivalent."""
    from bigdata06_spark.compat import activate_protobuf_for_session

    activate_protobuf_for_session(events.sparkSession)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_user_peak_processor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
