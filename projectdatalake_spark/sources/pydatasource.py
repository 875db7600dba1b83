"""Custom connector via the Python Data Source API (Spark 4).

The reference's only connector story is s3a JSON/parquet (reference
etl.py:23, 37); a user extending it to a bespoke feed would write a
connector. This module is that path demonstrated end-to-end: a
DataSource/DataSourceReader pair that Spark plans as a regular scan —
partition-parallel (one InputPartition per slice, executed across the
cluster), schema-first, and usable from ``spark.read.format(...)`` like
any built-in source.

The shipped source generates a DETERMINISTIC synthetic table (fields are
md5-derived from the row id), which makes it oracle-checkable: DuckDB can
recompute the identical rows from generate_series — so the driver gate
proves the connector's values, not just that it runs.

Scale notes: partitions() is the parallelism contract — each slice reads
independently on an executor Python worker (Arrow-batched back to the
JVM). A real connector would map slices to file ranges / shards / topic
partitions; the generator here maps them to id ranges. Row-at-a-time
yield is fine for a demo source; a production one should yield Arrow
RecordBatches (the API accepts both) to stay off the per-row path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "id BIGINT, category STRING, score DOUBLE"


def _row(i: int):
    h16 = int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16)
    bucket = h16 % 100
    return (i, f"c{bucket % 5}", bucket / 100.0)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticRowsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("rows", "1000"))
        self.k = max(1, int(options.get("numPartitions", "8")))

    def partitions(self):
        step = -(-self.n // self.k)
        return [
            _Slice(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield _row(i)


class SyntheticRowsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: the same deterministic rows arriving as a bounded
    feed of micro-batches (``rowsPerBatch`` ids per trigger, ``maxRows``
    total). Offsets are plain row counters, so restart-from-checkpoint
    resumes exactly (the offset IS the row id) — the replayable-source
    half of Structured Streaming's exactly-once contract, demonstrated
    without Kafka in the container."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsPerBatch", "100"))
        self.max_rows = int(options.get("maxRows", "1000"))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.rows_per_batch, self.max_rows)
        end = {"next": hi}
        return iter([_row(i) for i in range(lo, hi)]), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(i) for i in range(start["next"], end["next"])])


class SyntheticRowsSource(DataSource):
    """spark.read.format("synthetic_rows").option("rows", N)"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_rows"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticRowsReader:
        return SyntheticRowsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticRowsStreamReader:
        return SyntheticRowsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticRowsSource)
