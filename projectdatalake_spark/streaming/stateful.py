"""Custom stateful streaming operators (applyInPandasWithState).

The escape hatch for streaming semantics the built-in windowed aggregations
cannot express: arbitrary per-key state evolved across micro-batches with
Arrow-batched Python kernels. State is a plain tuple schema persisted in the
state store; output flows per batch.

Scale notes: state is partitioned by the group key (one shuffle), batches
stream through Arrow, and state size is O(keys) — bounded here to two longs
and a double per user. Use timeouts (the ``timeoutConf`` argument) to expire
idle keys on unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, total value) evolved across micro-batches.

    Value accumulates in integer cents inside the state (exact,
    batch-order-independent — the same determinism contract as the batch
    engine's decimal sums) and surfaces as double.
    """

    def kernel(key, pdf_iter: Iterator, state) -> Iterator:
        import pandas as pd

        (user_id,) = key
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            n += len(pdf)
            # values are true 2-decimal; round once per row then sum ints
            cents += int((pdf["value"] * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(kernel, _OUT, _STATE, "update", "NoTimeout")
    )


_PROFILE_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_types", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def user_profile_stats(events: DataFrame) -> DataFrame:
    """Per-user profile via ``transformWithStateInPandas`` — Spark 4's
    composite-state successor to applyInPandasWithState: named state
    variables instead of one tuple blob. A MapState holds per-event-type
    counts (the map key IS state-store-indexed — no read-modify-write of
    a whole dict per batch) and ValueStates the event count and running
    max. Every tracked quantity is an order-independent aggregate, so an
    availableNow replay equals the batch GROUP BY exactly, whatever the
    micro-batch slicing.

    Scale: state is RocksDB-backed (required by transformWithState),
    partitioned by user; per-key size is O(|event types|). TTL hooks
    (ttlDurationMs) bound idle keys on unbounded key spaces."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class ProfileProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._type_counts = handle.getMapState(
                "type_counts", "event_type string", "n bigint"
            )
            self._n_events = handle.getValueState("n_events", "n bigint")
            self._max_value = handle.getValueState("max_value", "v double")

        def handleInputRows(self, key, rows, timer_values):
            import pandas as pd

            (user_id,) = key
            n = self._n_events.get()[0] if self._n_events.exists() else 0
            mx = self._max_value.get()[0] if self._max_value.exists() else None
            for pdf in rows:
                if not len(pdf):
                    continue
                n += len(pdf)
                bmax = float(pdf["value"].max())
                mx = bmax if mx is None else max(mx, bmax)
                for etype, cnt in pdf.groupby("event_type").size().items():
                    prev = (
                        self._type_counts.getValue((etype,))[0]
                        if self._type_counts.containsKey((etype,))
                        else 0
                    )
                    self._type_counts.updateValue((etype,), (prev + int(cnt),))
            self._n_events.update((n,))
            if mx is not None:
                self._max_value.update((mx,))
            n_types = sum(1 for _ in self._type_counts.keys())
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "n_types": [n_types],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            ProfileProcessor(), _PROFILE_OUT, outputMode="Update", timeMode="None"
        )
    )
