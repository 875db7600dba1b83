"""Streaming fault tolerance: a checkpointed query killed mid-backlog and
restarted must resume from the checkpoint (not reprocess) and converge to
exactly the batch answer. This is the recovery contract a production
stream relies on; run_available_now's memory-sink path never restarts, so
this test drives writeStream directly with a durable checkpoint + file
sink."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from projectdatalake_spark.sources.readers import load_table
from projectdatalake_spark.streaming.events import tumbling_window_agg
from tests.conftest import SF_SMOKE


@pytest.fixture()
def split_events_dir(spark, tmp_path):
    """The corpus as 4 CHRONOLOGICAL files (quartiles of event time,
    written oldest-first) so the file stream replays an ordered backlog —
    with time-shuffled files the watermark would race ahead on file 1 and
    correctly drop everything else as late, which is watermark semantics,
    not the recovery property under test."""
    import time as _time

    from pyspark.sql import Window

    src = str(tmp_path / "events_split")
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "q", F.ntile(4).over(Window.orderBy("ts"))
    )
    for i in range(1, 5):
        ev.filter(F.col("q") == i).drop("q").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(0.05)  # distinct mtimes → deterministic file order
    return src


def _stream(spark, src):
    raw = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # watermarks need TimestampType (ltz); session TZ is pinned UTC so the
    # ntz→ltz cast is identity (same normalization as read_events_stream)
    return tumbling_window_agg(raw.withColumn("ts", F.col("ts").cast("timestamp")))


def test_restart_from_checkpoint_matches_batch(spark, tmp_path, split_events_dir):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        # phase 1: process exactly 2 of the 4 files, then stop (the "crash")
        q = (
            _stream(spark, split_events_dir)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        import time

        deadline = time.time() + 120
        while time.time() < deadline:
            if len(q.recentProgress) >= 2:
                break
            time.sleep(0.3)
        q.stop()
        q.awaitTermination()

        # phase 2: restart from the same checkpoint; availableNow drains the
        # remaining backlog and flushes closed windows
        q2 = (
            _stream(spark, split_events_dir)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    streamed = spark.read.parquet(out)
    # batch twin: same aggregation, minus the windows append mode holds back
    # (watermark never passes the final window in a bounded replay)
    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(27,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("w_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    # exactly-once across the restart: no window emitted twice
    dupes = streamed.groupBy("w_start", "event_type").count().filter("count > 1")
    assert dupes.count() == 0
    # every emitted row is value-correct (a reprocessed partial batch would
    # produce a row batch doesn't contain)
    assert streamed.exceptAll(batch).count() == 0
    # completeness: append mode holds back only windows the final watermark
    # (max event time − 1h) hasn't passed; everything clearly older than
    # 3h before the last window must have been flushed
    from datetime import timedelta

    max_start = batch.agg(F.max("w_start")).collect()[0][0]
    cutoff = max_start - timedelta(hours=3)
    must_emit = batch.filter(F.col("w_start") <= F.lit(cutoff))
    assert must_emit.exceptAll(streamed).count() == 0
    assert streamed.count() >= must_emit.count() > 0


def test_fanout_partial_failure_completes_lagging_sink(spark, tmp_path):
    """The two-sink crash: sink 1 commits a batch, sink 2 raises before
    committing it, the query dies. On restart the checkpoint replays the
    batch; sink 1's (app_id, batch_id) ledger no-ops the duplicate while
    sink 2 completes — both tables converge to the source with no
    double-count and no gap, with zero cross-sink coordination."""
    from projectdatalake_spark.sources.delta_interop import DeltaTable
    from projectdatalake_spark.sources.txlog import TxTable
    from projectdatalake_spark.streaming.fanout import fanout_stream

    src = str(tmp_path / "src")
    spark.range(0, 400).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).cast("string").alias("event_type"),
        (F.col("id") * 1.0).alias("value"),
    ).repartition(8).write.mode("overwrite").parquet(src)
    schema = "event_id long, event_type string, value double"

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )

    tx = TxTable.create(
        spark, str(tmp_path / "tx"), spark.createDataFrame([], schema)
    )
    dl = DeltaTable.create(
        spark, str(tmp_path / "dl"), spark.createDataFrame([], schema)
    )
    ckpt = str(tmp_path / "ckpt")
    boom = {"armed": True}

    def delta_sink(df, bid):
        if boom["armed"] and bid == 1:
            raise RuntimeError("injected crash AFTER txlog committed batch 1")
        dl.append(df, txn=(ckpt, bid))

    sinks = [lambda df, bid: tx.append_once(df, ckpt, bid), delta_sink]
    q = fanout_stream(stream(), sinks, ckpt)
    with pytest.raises(Exception):
        q.awaitTermination(600)  # the injected crash kills the query
    tx_mid = tx.latest_version()
    assert tx_mid >= 1 and dl.latest_version() < tx_mid  # sinks diverged
    boom["armed"] = False
    q2 = fanout_stream(stream(), sinks, ckpt)  # same checkpoint: resume
    q2.awaitTermination(600)
    n_tx = tx.snapshot().count()
    n_dl = dl.snapshot().count()
    assert n_tx == n_dl == 400, (n_tx, n_dl)
    # txlog did NOT double-apply the replayed batch
    assert tx.snapshot().select("event_id").distinct().count() == 400


def test_fanout_three_formats_all_fenced(spark, tmp_path):
    """The fanout is format-agnostic: txlog + Delta + Iceberg sinks from
    one foreachBatch, each on its own idempotence ledger (append_once /
    txn action / snapshot-summary ledger); a hand-replayed batch id
    no-ops on all three."""
    from projectdatalake_spark.sources.delta_interop import DeltaTable
    from projectdatalake_spark.sources.iceberg_interop import IcebergTable
    from projectdatalake_spark.sources.txlog import TxTable
    from projectdatalake_spark.streaming.fanout import fanout_stream

    src = str(tmp_path / "src")
    spark.range(0, 300).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 4).cast("string").alias("event_type"),
        (F.col("id") * 1.0).alias("value"),
    ).repartition(6).write.mode("overwrite").parquet(src)
    schema = "event_id long, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    empty = spark.createDataFrame([], schema)
    tx = TxTable.create(spark, str(tmp_path / "tx"), empty)
    dl = DeltaTable.create(spark, str(tmp_path / "dl"), empty)
    ice = IcebergTable.create_empty(spark, str(tmp_path / "ice"), empty.schema)
    ckpt = str(tmp_path / "ckpt")
    sinks = [
        lambda df, bid: tx.append_once(df, ckpt, bid),
        lambda df, bid: dl.append(df, txn=(ckpt, bid)),
        lambda df, bid: ice.append_once(df, ckpt, bid),
    ]
    q = fanout_stream(stream, sinks, ckpt)
    q.awaitTermination(600)
    counts = (
        tx.snapshot().count(), dl.snapshot().count(), ice.snapshot().count()
    )
    assert counts == (300, 300, 300), counts
    snap_ice = ice.current_snapshot_id()
    vt, vd = tx.latest_version(), dl.latest_version()
    replay = spark.createDataFrame([(9_999, "x", 0.0)], schema)
    for sink in sinks:
        sink(replay, 0)
    assert tx.latest_version() == vt
    assert dl.latest_version() == vd
    assert ice.current_snapshot_id() == snap_ice
