"""Empty-micro-batch property sweep across EVERY foreachBatch sink in
the repo (round-10 verdict item 9: the streaming dedup crash was the
instance; this is the class).

A long-lived production stream WILL serve zero-row micro-batches — a
quiet source period, or this container's racy file-source listing
(round 10 minimal-repro'd an empty batch 0 under maxFilesPerTrigger).
Every sink must treat them as first-class: the query survives, the
final table state equals the non-empty data, and idempotence fencing
is not corrupted by the empty commit.

The harness forces DETERMINISTIC empty batches: a zero-row parquet
file with a backdated mtime leads the source dir, so the oldest-first
file source serves it as batch 0 (and, where noted, batch 1) under
``maxFilesPerTrigger=1``.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

SCHEMA = "k long, v double"


def _sorted_rows(df):
    return sorted((r.k, r.v) for r in df.select("k", "v").collect())


def _src_with_empty_first(spark, tmp_path, n_empty: int = 1) -> tuple[str, list]:
    """Source dir: 3 one-row-group data files preceded by ``n_empty``
    zero-row parquet files backdated so they stream as the first
    batches. Returns (dir, expected rows)."""
    data = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
    )
    src = str(tmp_path / "src")
    data.withColumn("g", F.col("k") % 3).repartition(3, "g").drop(
        "g"
    ).write.mode("overwrite").parquet(src)
    stage = str(tmp_path / "stage")
    data.limit(0).coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    now = os.path.getmtime(src)
    for i in range(n_empty):
        dst = os.path.join(src, f"zz_empty_{i}.parquet")
        shutil.copy(os.path.join(stage, part), dst)
        os.utime(dst, (now - 1000 + i, now - 1000 + i))
    return src, _sorted_rows(data)


def _stream(spark, src: str):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _await_ok(q):
    q.awaitTermination(600)
    assert q.exception() is None, q.exception()


# --- sink builders ---------------------------------------------------------
# each: (spark, tmp_path, stream) -> rows the sink's table finally holds


def _txlog_append(spark, tmp_path, stream):
    from projectdatalake_spark.sources.txlog import TxTable, append_stream

    t = TxTable.create(
        spark, str(tmp_path / "tx"),
        spark.createDataFrame([], SCHEMA),
    )
    _await_ok(append_stream(stream, t, str(tmp_path / "ck")))
    return _sorted_rows(t.snapshot())


def _txlog_upsert(spark, tmp_path, stream):
    from projectdatalake_spark.sources.txlog import TxTable, upsert_stream

    t = TxTable.create(
        spark, str(tmp_path / "tx"),
        spark.createDataFrame([(0, -1.0)], SCHEMA),
    )
    _await_ok(upsert_stream(stream, t, ["k"], str(tmp_path / "ck")))
    return _sorted_rows(t.snapshot())


def _delta_append(spark, tmp_path, stream):
    from projectdatalake_spark.sources.delta_interop import (
        DeltaTable,
        append_stream,
    )

    t = DeltaTable.create(
        spark, str(tmp_path / "d"), spark.createDataFrame([], SCHEMA)
    )
    _await_ok(append_stream(stream, t, str(tmp_path / "ck")))
    return _sorted_rows(t.snapshot())


def _delta_upsert(spark, tmp_path, stream):
    from projectdatalake_spark.sources.delta_interop import (
        DeltaTable,
        upsert_stream,
    )

    t = DeltaTable.create(
        spark, str(tmp_path / "d"),
        spark.createDataFrame([(0, -1.0)], SCHEMA),
    )
    _await_ok(upsert_stream(stream, t, ["k"], str(tmp_path / "ck")))
    return _sorted_rows(t.snapshot())


def _iceberg_append(spark, tmp_path, stream):
    from projectdatalake_spark.sources.iceberg_interop import (
        IcebergTable,
        append_stream,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "i"), spark.createDataFrame([], SCHEMA)
    )
    _await_ok(append_stream(stream, t, str(tmp_path / "ck")))
    return _sorted_rows(t.snapshot())


def _iceberg_upsert(spark, tmp_path, stream):
    from projectdatalake_spark.sources.iceberg_interop import (
        IcebergTable,
        upsert_stream,
    )

    t = IcebergTable.create(
        spark, str(tmp_path / "i"),
        spark.createDataFrame([(0, -1.0)], SCHEMA),
    )
    _await_ok(upsert_stream(stream, t, ["k"], str(tmp_path / "ck")))
    return _sorted_rows(t.snapshot())


def _fanout(spark, tmp_path, stream):
    from projectdatalake_spark.sources.txlog import TxTable
    from projectdatalake_spark.streaming.fanout import fanout_stream

    t1 = TxTable.create(
        spark, str(tmp_path / "f1"), spark.createDataFrame([], SCHEMA)
    )
    t2 = TxTable.create(
        spark, str(tmp_path / "f2"), spark.createDataFrame([], SCHEMA)
    )
    _await_ok(
        fanout_stream(
            stream,
            [
                lambda df, bid: t1.append_once(df, "f1", bid),
                lambda df, bid: t2.append_once(
                    df.filter(F.col("k") % 2 == 0), "f2", bid
                ),
            ],
            str(tmp_path / "ck"),
        )
    )
    rows1 = _sorted_rows(t1.snapshot())
    rows2 = _sorted_rows(t2.snapshot())
    assert rows2 == [r for r in rows1 if r[0] % 2 == 0]
    return rows1


CASES = {
    "txlog_append": _txlog_append,
    "txlog_upsert": _txlog_upsert,
    "delta_append": _delta_append,
    "delta_upsert": _delta_upsert,
    "iceberg_append": _iceberg_append,
    "iceberg_upsert": _iceberg_upsert,
    "fanout_two_sinks": _fanout,
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_sink_survives_empty_first_batches(spark, tmp_path, name):
    """Two forced-empty leading micro-batches, then the data: the query
    terminates cleanly and the table holds exactly the data rows (for
    upserts: the seeded k=0 row is overwritten by the stream's k=0)."""
    src, expected = _src_with_empty_first(spark, tmp_path, n_empty=2)
    got = CASES[name](spark, tmp_path, _stream(spark, src))
    assert got == expected, (name, got[:5], expected[:5])


def test_kll_partial_of_empty_batch_merges_as_identity(spark):
    """The stream_kll_quantiles sink shape: a zero-row micro-batch's
    column partial must merge into the running sketch as the identity
    (n unchanged), not crash the foreachBatch."""
    from projectdatalake_spark.operators.aggregates import (
        KLLSketch,
        column_kll_sketch,
    )

    df = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
    sk = column_kll_sketch(df, "v", k=1024)
    empty = column_kll_sketch(df.limit(0), "v", k=1024)
    merged = sk.merge(empty)
    assert merged.n == sk.n == 100
    assert KLLSketch(1024).merge(empty).n == 0
