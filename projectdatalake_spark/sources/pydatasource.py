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
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


class _Staged(WriterCommitMessage):
    """One task's staged output: its temp file + row count."""

    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JsonlWriter(DataSourceWriter):
    """Transactional JSON-lines sink — the WRITE half of the Python Data
    Source API, with the same two-phase contract every table format uses:
    tasks write to ``_staging`` and return commit messages; ONLY the
    driver's ``commit`` moves files into place and publishes a manifest,
    so a job that dies mid-write leaves nothing visible (``abort``
    removes the stage). Readers glob ``part-*.jsonl`` and never see
    staging. A speculative/retried task stages a second file, but only
    the messages Spark hands to commit() are published — the exactness
    contract the API documents.

    Scale: one file per task, no driver data plane (commit touches file
    NAMES only). A real deployment points this at object storage; the
    local-FS rename is the sandbox stand-in for PUT-after-multipart."""

    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import json as _json
        import os
        import uuid as _uuid

        os.makedirs(f"{self.path}/_staging", exist_ok=True)
        tmp = f"{self.path}/_staging/part-{_uuid.uuid4().hex}.jsonl"
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(_json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _Staged(tmp, n)

    def commit(self, messages):
        import json as _json
        import os

        if self.overwrite:
            for f in os.listdir(self.path):
                if f.endswith(".jsonl"):
                    os.remove(os.path.join(self.path, f))
        names = []
        for m in messages:
            dest = os.path.join(self.path, os.path.basename(m.path))
            os.replace(m.path, dest)
            names.append(os.path.basename(dest))
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            _json.dump(
                {"files": sorted(names), "rows": sum(m.rows for m in messages)},
                fh,
            )

    def abort(self, messages):
        import os

        for m in messages:
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonlSinkSource(DataSource):
    """df.write.format("jsonl_sink").option("path", dir).save()"""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SyntheticRowsSource)
    spark.dataSource.register(JsonlSinkSource)
