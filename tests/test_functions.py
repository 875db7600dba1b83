"""Scalar-function edges: F9 surrogate ids, F1 precision, F7 week-year."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from projectdatalake_spark.functions.scalar import epoch_millis_to_ts, weekday_name


def test_monotonically_increasing_id_unique(spark):
    # F9 (reference etl.py:164): nondeterministic across runs, so it is
    # exercised here, never in hash-checked queries (SURVEY.md §2.5).
    df = spark.range(0, 10_000, 1, 8).withColumn("sid", F.monotonically_increasing_id())
    assert df.select("sid").distinct().count() == 10_000


def test_epoch_millis_preserves_fraction(spark):
    # F1 (reference etl.py:92): division keeps the millisecond fraction
    df = spark.createDataFrame([(1704067200123,)], ["ms"])
    out = df.select(epoch_millis_to_ts(F.col("ms")).alias("ts")).first()
    assert out.ts.microsecond == 123000


def test_epoch_millis_keeps_sub_millisecond_fraction(spark):
    # division semantics on a DOUBLE input: 1234.5 ms lands as 1.2345 s,
    # not truncated to the whole millisecond
    df = spark.createDataFrame([(1704067200123.5,)], ["ms"])
    out = df.select(epoch_millis_to_ts(F.col("ms")).alias("ts")).first()
    assert out.ts.microsecond == 123500


def test_calendar_year_not_week_year(spark):
    # F7 documented deviation: Dec 30 2023 belongs to ISO week-year 2024;
    # the engine uses calendar year (the reference author's evident intent)
    df = spark.createDataFrame([(dt.datetime(2023, 12, 30, 12, 0),)], ["ts"])
    row = df.select(
        F.year("ts").alias("cal_year"),
        F.weekofyear("ts").alias("week"),
        weekday_name(F.col("ts")).alias("weekday"),
    ).first()
    assert row.cal_year == 2023
    assert row.week == 52
    assert row.weekday == "Saturday"
