"""Readers: the engine's scan operators.

Reference parity (SURVEY.md §2.1):
- S1/S2 JSON glob scans (reference etl.py:43, etl.py:87) → ``read_json`` with
  an explicit schema (no inference pass) and glob/recursive lookup support.
- S3 Parquet scan (reference etl.py:141-146) → ``read_parquet`` /
  ``load_table``.
- S6 object-store connector (reference etl.py:23 s3a) → paths are URIs; the
  same code reads ``s3a://`` when the hadoop-aws jars are on the classpath.
  Locally we read ``/root/testdata``.

Scale notes: explicit schemas avoid a full inference pass over 100 TB of
JSON; column pruning and predicate pushdown are left to Catalyst (callers
express ``select``/``filter`` declaratively and the parquet scan receives
PushedFilters/ReadSchema automatically).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from projectdatalake_spark.session import prepare


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (S3). Self-describing schema; vectorized reader."""
    prepare(spark)
    return spark.read.parquet(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    multiline: bool = False,
) -> DataFrame:
    """JSON scan with explicit schema (S1/S2).

    ``multiline=True`` covers the reference's one-object-per-file song layout
    (reference etl.py:37); default JSON-lines covers its log layout
    (reference etl.py:78).
    """
    prepare(spark)
    reader = spark.read.schema(schema)
    if multiline:
        reader = reader.option("multiLine", "true")
    return reader.json(path)


def normalize_events(df: DataFrame) -> DataFrame:
    """Normalize the events table's nanosecond epoch to a usable timestamp.

    The driver corpus stores ``events.ts`` as parquet TIMESTAMP(NANOS); we
    read it as epoch-nanos long (session conf) and derive:

    - ``ts``     timestamp_ntz at microsecond precision (truncated, matching
                 DuckDB's ns→µs cast) — the engine's working event time.
    - ``ts_ns``  the original epoch nanos, preserved losslessly.

    Mirrors the reference's epoch-to-timestamp convention (epoch millis ÷
    1000 → timestamp, reference etl.py:92) at nanosecond granularity.
    """
    if dict(df.dtypes).get("ts") != "bigint":
        # Timestamp-typed corpus (µs precision): derive epoch-nanos so the
        # ts_ns-consuming operators see the same column either way. Session
        # TZ is pinned UTC (session.RUNTIME_CONFS), so the ntz→ltz cast is
        # the identity mapping and unix_micros is deterministic.
        return df.withColumn(
            "ts_ns",
            F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000),
        )
    return df.withColumn("ts_ns", F.col("ts")).withColumn(
        "ts",
        F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-corpus table, normalizing event time if applicable."""
    df = read_parquet(spark, table_path(sf_dir, name))
    if name == "events":
        df = normalize_events(df)
    return df
