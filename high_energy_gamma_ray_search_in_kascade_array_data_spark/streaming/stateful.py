"""Custom stateful streaming operator (SURVEY §2.11:
``applyInPandasWithState`` — arbitrary per-key state the built-in
windowed aggregates can't express).

The operator keeps a running (count, max_value) per user and emits the
updated totals every micro-batch. State is two numbers per key —
bounded by key cardinality, the 100 TB requirement for any streaming
state. The batch-replay equivalence (final emission per user ==
batch aggregate) is what the oracle checks.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("mx", DoubleType()),
    ]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, max(value)) with explicit GroupState."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, mx = state.get if state.exists else (0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((n, mx))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "max_value": [mx]})

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def transform_with_state_available() -> bool:
    """``transformWithStateInPandas`` ships a protobuf-based state
    protocol between the JVM state server and the Python worker; the
    ``protobuf`` package is not part of pyspark's hard deps and is
    absent from some runtimes (including this container). The compat
    shim (``compat/pbshim.py``) can alias a vendored pure-Python copy
    into place — try that before gating."""
    from high_energy_gamma_ray_search_in_kascade_array_data_spark.compat import pbshim

    if not pbshim.install():
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401
        from pyspark.sql.streaming.proto import StateMessage_pb2

        # Descriptor round-trip smoke (ADVICE r5): the shimmed path is
        # exactly where NON-ImportError failures arise — pyspark's
        # protobuf-5.x-generated StateMessage_pb2 running on a vendored
        # 4.x runtime can raise TypeError/AttributeError from the
        # descriptor pool even though both imports succeed. Serialize
        # and re-parse a real state-protocol message so any shim
        # incompatibility gates cleanly here instead of crashing the
        # stream at start.
        probe = StateMessage_pb2.StateRequest(version=2)
        return StateMessage_pb2.StateRequest.FromString(
            probe.SerializeToString()
        ).version == 2
    except Exception:  # noqa: BLE001 — any failure means "not available"
        return False


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """The same per-user running (count, max(value)) through Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState``: state is typed and named
    (``getValueState``), timers/TTL are first-class, and the state
    store is RocksDB-backed (required by the API; changelog-checkpointed
    at scale instead of full HDFS snapshots). Semantics here are
    identical to :func:`running_user_stats`, which is exactly what the
    test asserts — same query, either stateful engine, same answer.

    Requires :func:`transform_with_state_available` (protobuf); the
    query runs and crashes at stream start without it, so callers must
    gate. RocksDB provider conf:
    ``spark.sql.streaming.stateStore.providerClass =
    org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, mx = self._stats.get() if self._stats.exists() else (0, float("-inf"))
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    mx = max(mx, float(pdf["value"].max()))
            self._stats.update((n, mx))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "max_value": [mx]})

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningStats(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )
