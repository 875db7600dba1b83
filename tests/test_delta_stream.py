"""Delta streaming source: version-offset CDF replay over a real Delta
table (sources/delta_stream.py), the delta_interop twin of the txlog
streaming source. Asserts stream/batch agreement, executor-side partition
fan-out, checkpoint resume, and the DV delete path."""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from projectdatalake_spark.sources import delta_stream
from projectdatalake_spark.sources.delta_interop import DeltaTable


def _mk_table(spark, root):
    df = (
        spark.range(0, 100)
        .withColumn("seg", (F.col("id") % 3).cast("int"))
        .withColumn("val", F.col("id") * 1.0)
        .repartition(4)
    )
    t = DeltaTable.create(spark, root, df, partition_by=("seg",))
    t.append(
        spark.range(100, 120)
        .withColumn("seg", F.lit(5).cast("int"))
        .withColumn("val", F.lit(0.0))
    )
    t.delete_where_dv("id % 10 = 7")
    t.optimize()
    return t


def _drain(spark, root, **options):
    delta_stream.register(spark)
    name = "ds_" + uuid.uuid4().hex[:8]
    reader = spark.readStream.format("delta_changes").option("path", root)
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


def test_stream_matches_batch_changes(spark):
    root = tempfile.mkdtemp(prefix="dstream_t1_")
    t = _mk_table(spark, root)
    out = _drain(spark, root)
    got = sorted(
        out.select("id", "seg", "val", "_change_type", "_commit_version").collect()
    )
    want = sorted(
        t.changes(0)
        .select("id", "seg", "val", "_change_type", "_commit_version")
        .collect()
    )
    assert got == want  # byte-identical to the batch API
    assert dict(out.dtypes)["seg"] == "int"
    # OPTIMIZE (v3) emitted nothing
    assert out.filter("_commit_version = 3").count() == 0


def test_starting_version_inclusive(spark):
    root = tempfile.mkdtemp(prefix="dstream_t2_")
    _mk_table(spark, root)
    out = _drain(spark, root, startingVersion="2")
    assert set(r["_commit_version"] for r in out.collect()) == {2}
    assert out.count() == 12  # the DV delete's exact rows


def test_partition_fanout_is_per_file(spark):
    root = tempfile.mkdtemp(prefix="dstream_t3_")
    _mk_table(spark, root)
    reader = delta_stream.DeltaChangesStreamReader({"path": root})
    parts = reader.partitions({"version": -1}, {"version": 2})
    # one partition per changed file per commit — executor fan-out
    assert len(parts) > 3
    kinds = {p.kind for p in parts}
    assert kinds == {"insert", "delete-dv"}


def test_batch_size_guard(spark):
    root = tempfile.mkdtemp(prefix="dstream_t4_")
    _mk_table(spark, root)
    reader = delta_stream.DeltaChangesStreamReader(
        {"path": root, "maxRowsPerBatch": "10"}
    )
    with pytest.raises(ValueError, match="maxRowsPerBatch"):
        reader.partitions({"version": -1}, {"version": 2})


def test_checkpoint_resume_no_duplicates(spark):
    root = tempfile.mkdtemp(prefix="dstream_t5_")
    ckpt = tempfile.mkdtemp(prefix="dstream_ckpt_")
    sink = tempfile.mkdtemp(prefix="dstream_sink_") + "/out"
    t = _mk_table(spark, root)
    delta_stream.register(spark)

    def drain():
        q = (
            spark.readStream.format("delta_changes")
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
    assert spark.read.parquet(sink).count() == 132  # 100+20 inserts + 12 deletes
    t.append(
        spark.range(200, 210)
        .withColumn("seg", F.lit(9).cast("int"))
        .withColumn("val", F.lit(1.0))
    )
    drain()  # restart resumes from the checkpointed version offset
    rows = spark.read.parquet(sink).collect()
    # exactly-once: the second drain delivered ONLY the new commit
    assert len(rows) == 142
    assert sum(1 for r in rows if r["_commit_version"] == 4) == 10


def test_delta_upsert_stream_exactly_once(spark):
    """Delta streaming upsert sink: one MERGE commit per micro-batch
    with a setTransaction action; replaying the same stream against the
    same checkpoint commits nothing new (and never double-applies)."""
    import tempfile

    from pyspark.sql import functions as F

    from projectdatalake_spark.sources.delta_interop import (
        DeltaTable, upsert_stream,
    )

    base = spark.range(0, 20).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v")
    )
    root = tempfile.mkdtemp(prefix="delta_ups_t_") + "/t"
    t = DeltaTable.create(spark, root, base)
    src = tempfile.mkdtemp(prefix="delta_ups_src_")
    spark.range(10, 30).select(
        F.col("id").alias("k"), F.lit(2.0).alias("v")
    ).write.mode("overwrite").parquet(src)
    ckpt = tempfile.mkdtemp(prefix="delta_ups_ckpt_")
    stream = spark.readStream.schema("k long, v double").parquet(src)
    upsert_stream(stream, t, ["k"], ckpt).awaitTermination(300)
    snap = t.snapshot()
    assert snap.count() == 30
    assert snap.filter("k < 10 AND v = 1.0").count() == 10
    assert snap.filter("k >= 10 AND v = 2.0").count() == 20
    tip = t.latest_version()
    # direct replay of the same (appId, batchId): skipped up front
    assert t.merge_upsert(
        spark.createDataFrame([(10, 9.0)], "k long, v double"),
        ["k"],
        txn=(ckpt, 0),
    ) == -1
    # full stream replay: same checkpoint → zero new versions
    stream2 = spark.readStream.schema("k long, v double").parquet(src)
    upsert_stream(stream2, t, ["k"], ckpt).awaitTermination(300)
    assert t.latest_version() == tip
    assert t.snapshot().count() == 30
