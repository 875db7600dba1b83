"""Python Data Source API connector (sources/pydatasource.py): batch scan
parallelism + determinism, and the streaming twin's bounded replay. Value
parity vs DuckDB is the pyds_custom_source driver query; these cover the
API properties the oracle hash can't."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from projectdatalake_spark.sources import pydatasource


def _read(spark, n=1000, k=4):
    pydatasource.register(spark)
    return (
        spark.read.format("synthetic_rows")
        .option("rows", str(n))
        .option("numPartitions", str(k))
        .load()
    )


def test_batch_scan_rows_and_determinism(spark):
    df = _read(spark)
    assert df.count() == 1000
    assert df.select("id").distinct().count() == 1000
    # partition-independent: 1 slice and 4 slices produce identical rows
    again = _read(spark, k=1)
    assert df.exceptAll(again).count() == 0


def test_batch_scan_respects_partitions(spark):
    df = _read(spark, n=1000, k=4)
    assert df.rdd.getNumPartitions() == 4


def test_stream_reader_bounded_replay(spark, tmp_path):
    pydatasource.register(spark)
    stream = (
        spark.readStream.format("synthetic_rows")
        .option("rowsPerBatch", "250")
        .option("maxRows", "1000")
        .load()
    )
    name = "pyds_stream_sink"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            if spark.table(name).count() >= 1000:
                break
            time.sleep(0.3)
    finally:
        q.stop()
        q.awaitTermination()
    got = spark.table(name)
    assert got.count() == 1000
    # exactly the batch rows: same generator, same values
    batch = _read(spark, n=1000)
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
