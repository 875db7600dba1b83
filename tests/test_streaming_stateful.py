"""transformWithStateInPandas operator (streaming/stateful.py
user_profile_stats): batch-equivalence of the availableNow replay.

The API's Python worker protocol needs google.protobuf, which this
container does not ship — the test skips there and runs on any cluster
with protobuf installed (the operator itself is complete). The
applyInPandasWithState twin is covered by the stream_stateful_totals
oracle query, which shares the replay/batch-equivalence contract.
"""

from __future__ import annotations

import pytest

pytest.importorskip("google.protobuf")

from pyspark.sql import functions as F  # noqa: E402

from projectdatalake_spark import streaming as ST  # noqa: E402
from projectdatalake_spark.streaming.stateful import user_profile_stats  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"

_ROCKSDB = {
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
}


def test_profile_stats_matches_batch(spark):
    got = ST.run_available_now(
        user_profile_stats(ST.read_events_stream(spark, SF_SMOKE)),
        output_mode="update",
        state_partitions=4,
        extra_confs=_ROCKSDB,
    )
    want = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.max("value").alias("max_value"),
        )
    )
    g = {tuple(r) for r in got.collect()}
    w = {tuple(r) for r in want.collect()}
    assert g == w
