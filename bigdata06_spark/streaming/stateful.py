"""Custom stateful streaming operator via applyInPandasWithState:
per-user running totals maintained in the state store across
micro-batches (the template for any custom accumulating operator the
built-in aggregations can't express).

State schema is explicit (`n long, cents long` — integer money so
accumulation is associative/exact); output is one row
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
STATE_SCHEMA = "n long, cents long"


def _update_user_state(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State carries CENTS as integers (values are 2dp): integer
    accumulation is associative, so the cumulative total is exact no
    matter how rows split across micro-batches — which is what lets
    the final emission match a batch SQL oracle bit-for-bit (float
    accumulation order would differ per replay)."""
    import numpy as np

    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int(np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [cents / 100.0]}
    )


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


TWS_LAST3_SCHEMA = "user_id long, n_seen long, last3 array<long>"


def _user_last3_processor():
    """StatefulProcessor using LISTSTATE: per user, keep the 3 most
    recent (ts, event_id) observations across micro-batches — the
    bounded-recency buffer behind "last N actions" features. The
    state is the pruned top-3 list itself (bounded per key, never the
    full history) plus a ValueState row count; order pins on
    (ts desc, event_id desc) so replays are deterministic."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    class UserLast3(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._buf = handle.getListState(
                "recent",
                StructType(
                    [StructField("ts", TimestampType()), StructField("event_id", LongType())]
                ),
            )
            self._n = handle.getValueState(
                "n", StructType([StructField("n", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            entries = [tuple(t) for t in self._buf.get()]
            n = self._n.get()[0] if self._n.exists() else 0
            for pdf in rows:
                n += len(pdf)
                # top-3 of the union == top-3 of (state ∪ each chunk's
                # top-3), so convert only 3 rows per chunk to Python
                # datetimes instead of the whole chunk (r12, guide
                # §4.2 — the conversion was the per-row cost; ordering
                # on the raw int64s is the datetime ordering)
                top = pdf.nlargest(3, ["ts", "event_id"])
                entries.extend(
                    (ts.to_pydatetime(), int(eid))
                    for ts, eid in zip(top["ts"], top["event_id"])
                )
            entries.sort(key=lambda e: (e[0], e[1]), reverse=True)
            entries = entries[:3]
            self._buf.put([(e[0], e[1]) for e in entries])
            self._n.update((n,))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_seen": [n],
                    "last3": [[e[1] for e in entries]],
                }
            )

        def close(self) -> None:
            pass

    return UserLast3()


TWS_TYPEMAP_SCHEMA = "user_id long, n_total long, type_counts string"


def _user_typemap_processor():
    """StatefulProcessor using MAPSTATE: per-user event_type → count,
    updated incrementally per batch (point lookups + upserts against
    the state store — the map never round-trips whole, which is the
    reason MapState exists vs a ValueState holding a dict). Emits the
    map as a canonical 'type:count' string sorted by type."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    class UserTypeMap(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "counts",
                StructType([StructField("event_type", StringType())]),
                StructType([StructField("n", LongType())]),
            )

        def handleInputRows(self, key, rows, timerValues):
            delta: dict[str, int] = {}
            n_batch = 0
            for pdf in rows:
                n_batch += len(pdf)
                for et, c in pdf["event_type"].value_counts().items():
                    delta[et] = delta.get(et, 0) + int(c)
            for et, c in delta.items():
                prev = self._counts.getValue((et,)) if self._counts.containsKey((et,)) else None
                self._counts.updateValue((et,), (int(prev[0]) + c if prev else c,))
            items = sorted((k[0], int(v[0])) for k, v in self._counts.iterator())
            n_total = sum(v for _, v in items)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_total": [n_total],
                    "type_counts": [",".join(f"{k}:{v}" for k, v in items)],
                }
            )

        def close(self) -> None:
            pass

    return UserTypeMap()


def user_type_counts(events: DataFrame) -> DataFrame:
    """Per-user event_type histogram via transformWithStateInPandas
    MapState — incremental point updates, canonical string emission.
    Update mode; final emission per user (max n_total) is the batch
    answer."""
    from bigdata06_spark.compat import activate_protobuf_for_session

    activate_protobuf_for_session(events.sparkSession)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_user_typemap_processor(),
        outputStructType=TWS_TYPEMAP_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def user_last3_events(events: DataFrame) -> DataFrame:
    """Per-user last-3 event ids (by event time) via
    transformWithStateInPandas ListState — state stays bounded at 3
    rows per key no matter the stream length. Update mode; the final
    emission per user (max n_seen) is the batch-equivalent answer."""
    from bigdata06_spark.compat import activate_protobuf_for_session

    activate_protobuf_for_session(events.sparkSession)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_user_last3_processor(),
        outputStructType=TWS_LAST3_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


TWS_PATTERN_SCHEMA = "user_id long, n_matches long, views_matched long"


def pattern_step(state: tuple, event_type: str) -> tuple:
    """ONE transition of the `view+ click purchase` automaton —
    module-level and pure so the DFA's semantics are property-testable
    against a regex reference independent of the streaming machinery
    (tests/test_property.py). State: (run_views, pending_click,
    matches, views_matched)."""
    run, pending, matches, vm = state
    if event_type == "view":
        return (run + 1 if not pending else 1, 0, matches, vm)
    if event_type == "click" and run > 0 and not pending:
        return (run, 1, matches, vm)
    if event_type == "purchase" and pending:
        return (0, 0, matches + 1, vm + run)
    return (0, 0, matches, vm)


def _user_pattern_processor():
    """StatefulProcessor running a per-user DFA for the quantified
    row pattern `view+ click purchase` (streaming MATCH_RECOGNIZE —
    the batch twin is `events_match_recognize`'s gaps-and-islands
    compilation). State is ONE ValueState row: the DFA position
    (current view-run length, click-pending flag) plus the cumulative
    match count and matched-view total — O(1) per key no matter the
    stream length, the property that makes pattern matching viable as
    streaming state where buffering raw history is not.

    Ordering contract: rows are sorted by (ts, event_id) WITHIN each
    batch before the DFA steps (transformWithState hands them over
    unordered); across batches the DFA carries its position, so a
    time-ordered batch sequence (the log-replay contract every
    file-source here satisfies) replays exactly the batch answer."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    class UserPattern(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState(
                "dfa",
                StructType([
                    StructField("run_views", LongType()),
                    StructField("pending_click", LongType()),
                    StructField("matches", LongType()),
                    StructField("views_matched", LongType()),
                ]),
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            run, pending, matches, vm = (
                tuple(self._st.get()) if self._st.exists() else (0, 0, 0, 0)
            )
            # sort by (ts, event_id) with numpy on the RAW epoch values
            # (r12, guide §4.2): the old form built a per-row
            # (pydatetime, int, str) tuple list and Python-sorted it —
            # ~100k Timestamp.to_pydatetime() calls per drain for an
            # ordering that only ever compares the underlying int64s.
            # Identical order: epoch int64 compares exactly like the
            # datetime it encodes; lexsort's primary key is the LAST
            # array. Only the event_type array is touched after the
            # sort — the DFA never reads ts/event_id.
            ts_p, eid_p, et_p = [], [], []
            for pdf in rows:
                # Series.astype("int64") yields epoch ticks for naive
                # AND tz-aware datetime dtypes alike (every chunk of a
                # drain shares one dtype, so the unit is consistent)
                ts_p.append(pdf["ts"].astype("int64").to_numpy())
                eid_p.append(pdf["event_id"].astype("int64").to_numpy())
                et_p.append(pdf["event_type"].to_numpy())
            order = np.lexsort((np.concatenate(eid_p), np.concatenate(ts_p)))
            st = (run, pending, matches, vm)
            for et in np.concatenate(et_p)[order]:
                st = pattern_step(st, et)
            run, pending, matches, vm = st
            self._st.update((run, pending, matches, vm))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_matches": [matches],
                    "views_matched": [vm],
                }
            )

        def close(self) -> None:
            pass

    return UserPattern()


def user_pattern_matches(events: DataFrame) -> DataFrame:
    """Per-user `view+ click purchase` match counts via
    transformWithStateInPandas ValueState (the streaming
    MATCH_RECOGNIZE DFA). Update mode; the final emission per user
    (max n_matches) is the batch-equivalent answer."""
    from bigdata06_spark.compat import activate_protobuf_for_session

    activate_protobuf_for_session(events.sparkSession)
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_user_pattern_processor(),
        outputStructType=TWS_PATTERN_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


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


# ---------------------------------------------- Misra-Gries as state

MG_OUTPUT_SCHEMA = "bucket long, seq long, k long, mg_count long"
MG_STATE_SCHEMA = "n long, seq long, ks array<long>, cs array<long>"


def mg_bucket_state(key_col: str, capacity: int):
    """applyInPandasWithState function maintaining a per-bucket
    Misra-Gries summary across micro-batches — the heavy-hitter twin
    of the streaming count-min sketch: state is <= capacity (key,
    counter) pairs per bucket REGARDLESS of stream length or key
    cardinality. Each invocation merges the batch's value_counts,
    applies the batched eviction (subtract the (capacity+1)-th largest,
    drop non-positive — same rule as the batch operator, same
    undercount bound n_bucket/(capacity+1)), and emits the CURRENT
    candidate set stamped with a per-bucket sequence number so the
    caller can select the final emission deterministically.

    Buckets are a hash of the KEY, so a key's full count lives in one
    bucket: a key with global count > N_bucket/(capacity+1) survives
    its bucket's summary — with B buckets, capacity >= B/phi makes the
    final candidates a superset of every phi-heavy key."""

    def fn(key, pdfs, state):
        (bucket,) = key
        if state.exists:
            n, seq, ks, cs = state.get
            counters = dict(zip(ks, cs))
        else:
            n, seq, counters = 0, 0, {}
        for pdf in pdfs:
            col = pdf[key_col].dropna()
            n += len(col)
            for k, c in col.value_counts().items():
                ki = int(k)
                counters[ki] = counters.get(ki, 0) + int(c)
            if len(counters) > capacity:
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {k2: v - cut for k2, v in counters.items() if v > cut}
        seq += 1
        state.update(
            (n, seq, list(counters), [counters[k2] for k2 in counters])
        )
        if counters:
            yield pd.DataFrame(
                {
                    "bucket": [bucket] * len(counters),
                    "seq": [seq] * len(counters),
                    "k": list(counters),
                    "mg_count": [counters[k2] for k2 in counters],
                }
            )

    return fn


def mg_bucket_candidates(
    events: DataFrame, key_col: str, n_buckets: int, capacity: int
) -> DataFrame:
    """Stream-side candidate generation: key rows by hash bucket, run
    the MG state function, emit (bucket, seq, k, mg_count) per batch."""
    from pyspark.sql import functions as F

    return (
        events.withColumn("bucket", F.pmod(F.col(key_col), F.lit(n_buckets)))
        .groupBy("bucket")
        .applyInPandasWithState(
            mg_bucket_state(key_col, capacity),
            MG_OUTPUT_SCHEMA,
            MG_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
