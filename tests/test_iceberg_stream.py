"""Iceberg streaming source: sequence-number CDF replay
(sources/iceberg_stream.py), the Iceberg twin of the Delta/txlog
streaming sources."""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from projectdatalake_spark.sources import iceberg_stream
from projectdatalake_spark.sources.iceberg_interop import IcebergTable


def _mk_table(spark, root):
    df = (
        spark.range(0, 100)
        .withColumn("seg", (F.col("id") % 3).cast("int"))
        .withColumn("val", F.col("id") * 1.0)
        .repartition(4)
    )
    t = IcebergTable.create(spark, root, df, partition_by=("seg",))
    t.append(
        spark.range(100, 120)
        .withColumn("seg", F.lit(5).cast("int"))
        .withColumn("val", F.lit(0.0))
    )
    t.delete_where("id % 10 = 7")
    return t


def _drain(spark, root, **options):
    iceberg_stream.register(spark)
    name = "is_" + uuid.uuid4().hex[:8]
    reader = spark.readStream.format("iceberg_changes").option("path", root)
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_stream_delivers_sequence_deltas(spark):
    root = tempfile.mkdtemp(prefix="istream_t1_")
    _mk_table(spark, root)
    out = _drain(spark, root)
    got = {
        (r["_commit_seq"], r["_change_type"]): r["count"]
        for r in out.groupBy("_commit_seq", "_change_type").count().collect()
    }
    assert got == {(1, "insert"): 100, (2, "insert"): 20, (3, "delete"): 12}
    # delete rows are row-exact and carry TYPED partition values
    d = out.filter("_change_type = 'delete'")
    assert sorted(r["id"] for r in d.collect()) == [
        i for i in range(120) if i % 10 == 7
    ]
    assert d.filter("seg IS NULL").count() == 0
    assert dict(out.dtypes)["seg"] == "int"


def test_starting_sequence(spark):
    root = tempfile.mkdtemp(prefix="istream_t2_")
    _mk_table(spark, root)
    out = _drain(spark, root, startingSequence="3")
    assert {r["_commit_seq"] for r in out.collect()} == {3}
    assert out.count() == 12


def test_partition_fanout_and_guard(spark):
    root = tempfile.mkdtemp(prefix="istream_t3_")
    _mk_table(spark, root)
    reader = iceberg_stream.IcebergChangesStreamReader({"path": root})
    parts = reader.partitions({"seq": -1}, {"seq": 3})
    assert len(parts) > 3
    assert {p.kind for p in parts} == {"insert", "delete"}
    guarded = iceberg_stream.IcebergChangesStreamReader(
        {"path": root, "maxRowsPerBatch": "10"}
    )
    with pytest.raises(ValueError, match="maxRowsPerBatch"):
        guarded.partitions({"seq": -1}, {"seq": 3})


def test_checkpoint_resume_exactly_once(spark):
    root = tempfile.mkdtemp(prefix="istream_t5_")
    ckpt = tempfile.mkdtemp(prefix="istream_ckpt_")
    sink = tempfile.mkdtemp(prefix="istream_sink_") + "/out"
    t = _mk_table(spark, root)
    iceberg_stream.register(spark)

    def drain():
        q = (
            spark.readStream.format("iceberg_changes")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    assert spark.read.parquet(sink).count() == 132
    t.append(
        spark.range(200, 210)
        .withColumn("seg", F.lit(9).cast("int"))
        .withColumn("val", F.lit(1.0))
    )
    drain()
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 142  # only the new snapshot arrived
    assert sum(1 for r in rows if r["_commit_seq"] == 4) == 10


def test_upsert_stream_exactly_once_and_last_wins(spark):
    """Streaming upsert sink: each micro-batch is one merge snapshot
    (equality delete + data, same seq); a replayed batch is skipped via
    the summary's (app-id, batch-id); re-running the SAME stream against
    the same checkpoint commits nothing new."""
    import tempfile

    from pyspark.sql import functions as F

    from projectdatalake_spark.sources.iceberg_interop import (
        IcebergTable, upsert_stream,
    )

    base = spark.range(0, 20).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v")
    )
    root = tempfile.mkdtemp(prefix="ice_ups_t_") + "/t"
    t = IcebergTable.create(spark, root, base)
    src = tempfile.mkdtemp(prefix="ice_ups_src_")
    spark.range(10, 30).select(
        F.col("id").alias("k"), F.lit(2.0).alias("v")
    ).write.mode("overwrite").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="ice_ups_ckpt_")
    stream = spark.readStream.schema("k long, v double").parquet(src)
    upsert_stream(stream, t, ["k"], ckpt).awaitTermination(300)
    snap = t.snapshot()
    assert snap.count() == 30
    assert snap.filter("k < 10 AND v = 1.0").count() == 10   # untouched
    assert snap.filter("k >= 10 AND v = 2.0").count() == 20  # upserted
    n_snaps = len(t.metadata()["snapshots"])
    # replay: same checkpoint, same source → zero new snapshots
    stream2 = spark.readStream.schema("k long, v double").parquet(src)
    upsert_stream(stream2, t, ["k"], ckpt).awaitTermination(300)
    assert len(t.metadata()["snapshots"]) == n_snaps
    assert t.snapshot().count() == 30
