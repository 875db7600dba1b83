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
