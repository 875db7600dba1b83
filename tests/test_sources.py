"""Source/sink round trips (S1-S5) and event-time normalization."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from projectdatalake_spark import schemas
from projectdatalake_spark.sources import (
    load_table,
    read_json,
    write_parquet,
    write_partitioned,
)


def test_events_ts_normalized(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    types = dict(ev.dtypes)
    assert types["ts"] == "timestamp_ntz"
    assert types["ts_ns"] == "bigint"
    row = ev.select("ts", "ts_ns").first()
    micros = row.ts_ns // 1000
    assert row.ts == dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=micros)


def test_partitioned_write_round_trip(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_status")
    write_partitioned(orders, out, ["o_orderstatus"])
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition column survives as a column and prunes on filter
    pruned = back.filter(F.col("o_orderstatus") == "O")
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "O").count()


def test_dynamic_partition_overwrite_only_touches_incoming(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "dyn")
    write_partitioned(orders, out, ["o_orderstatus"])
    before_f = spark.read.parquet(out).filter("o_orderstatus = 'F'").count()
    # overwrite only the 'O' partition with a single row
    one = orders.filter("o_orderstatus = 'O'").limit(1)
    write_partitioned(one, out, ["o_orderstatus"], dynamic=True)
    after = spark.read.parquet(out)
    assert after.filter("o_orderstatus = 'O'").count() == 1
    assert after.filter("o_orderstatus = 'F'").count() == before_f


def test_flat_write_round_trip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_flat")
    write_parquet(nation, out)
    assert spark.read.parquet(out).count() == nation.count()


def test_read_json_explicit_schema(spark, tmp_path):
    # JSON-lines log shape (S2, reference etl.py:87) with explicit schema —
    # no inference pass.
    p = tmp_path / "logs.json"
    rows = [
        {"page": "NextSong", "ts": 1704067200123, "userId": "7", "level": "paid"},
        {"page": "Home", "ts": 1704067300456, "userId": "7", "level": "paid"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_json(spark, str(p), schemas.LOG_DATA)
    assert df.schema == schemas.LOG_DATA
    assert df.filter(F.col("page") == "NextSong").count() == 1


def test_file_uri_four_level_glob(spark, tmp_path):
    """S6 shape (reference etl.py:37): URI-scheme paths + a 4-level glob
    over a nested JSON layout, then a hive-partitioned overwrite written
    and read back through the same file:// scheme. Locally file:// stands
    in for s3a:// — both go through the same Hadoop FileSystem API, so the
    glob/partition logic is scheme-agnostic."""
    import json as _json

    from pyspark.sql import types as T

    base = tmp_path / "songs"
    rows = []
    for i in range(8):
        a, b, c = chr(65 + i % 3), chr(65 + (i // 3) % 3), chr(65 + i % 2)
        d = base / a / b / c
        d.mkdir(parents=True, exist_ok=True)
        rec = {"song_id": f"S{i}", "year": 1990 + i % 4, "duration": 100.0 + i}
        (d / f"song{i}.json").write_text(_json.dumps(rec))
        rows.append(rec)

    schema = T.StructType(
        [
            T.StructField("song_id", T.StringType()),
            T.StructField("year", T.IntegerType()),
            T.StructField("duration", T.DoubleType()),
        ]
    )
    glob_uri = f"file://{base}/*/*/*/*.json"
    df = read_json(spark, glob_uri, schema)
    assert df.count() == len(rows)
    assert {r.song_id for r in df.collect()} == {r["song_id"] for r in rows}

    out_uri = f"file://{tmp_path}/songs_parquet"
    write_partitioned(df, out_uri, ["year"])
    back = spark.read.parquet(out_uri)
    assert back.count() == len(rows)
    # partition pruning through the URI path
    y = 1991
    assert (
        back.filter(F.col("year") == y).count()
        == sum(1 for r in rows if r["year"] == y)
    )


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    from projectdatalake_spark.sources.writers import compact_parquet

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "fragmented")
    # simulate incremental-write fragmentation: 16 tiny files
    orders.repartition(16).write.parquet(out)
    before_rows = orders.count()
    n_before, n_after = compact_parquet(spark, out, target_file_mb=256)
    assert n_before == 16
    assert n_after == 1  # tiny table packs into one target-size file
    back = spark.read.parquet(out)
    assert back.count() == before_rows
    assert sorted(back.columns) == sorted(orders.columns)


def test_schema_evolution_merge_read(spark, sf_dir, tmp_path):
    """Additive schema evolution on a plain-parquet table: old files keep
    the old schema, new files add a column; mergeSchema reads the union
    with NULLs for pre-evolution rows (the lakehouse-format behavior,
    minus transactionality)."""
    out = str(tmp_path / "evolving")
    nation = load_table(spark, sf_dir, "nation")
    nation.select("n_nationkey", "n_name").write.parquet(out)
    nation.select(
        "n_nationkey", "n_name", "n_regionkey"
    ).write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"n_nationkey", "n_name", "n_regionkey"}
    assert merged.count() == nation.count() * 2
    # pre-evolution rows surface NULL for the added column
    assert merged.filter(F.col("n_regionkey").isNull()).count() == nation.count()


def test_write_parquet_audited_single_pass(spark, tmp_path):
    """Observation metrics must describe exactly the written batch —
    counts/nulls/bounds match an independent re-read — and cost no
    second scan (the metrics come from the write job's own tasks)."""
    from pyspark.sql import functions as F

    from projectdatalake_spark.sources.writers import write_parquet_audited

    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") * 2).alias("v"),
    )
    out = str(tmp_path / "audited")
    metrics = write_parquet_audited(
        df,
        out,
        audit_cols={
            "n_rows": F.count(F.lit(1)),
            "null_v": F.count(F.when(F.col("v").isNull(), 1)),
            "max_id": F.max("id"),
        },
    )
    back = spark.read.parquet(out)
    assert metrics["n_rows"] == 1000 == back.count()
    assert metrics["null_v"] == 100 == back.where(F.col("v").isNull()).count()
    assert metrics["max_id"] == 999
