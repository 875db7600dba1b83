"""Stream an Iceberg v2 table's changes: 'Iceberg as a streaming source'.

A Python Data Source whose offsets are Iceberg SEQUENCE NUMBERS: each
micro-batch delivers the change rows of the snapshots that landed since
the last processed sequence — appends as inserts (the snapshot's ADDED
data files), delete snapshots as row-exact deletes (the position-delete
files' (file_path, pos) pairs resolved against their target data files).
Tagged ``_change_type`` / ``_commit_seq``; exactly-once via Structured
Streaming's checkpointed offsets (the snapshot history in the metadata
JSON is immutable).

Architecture mirrors delta_stream.py / txlog_stream.py: the DRIVER reads
only metadata — ``version-hint.text``, the metadata JSON, Avro manifest
lists/manifests (decoded with the sessionless avro_codec) — and plans one
``InputPartition`` per added data file (inserts) or per position-delete
file (deletes); EXECUTOR tasks decode rows with pyarrow. Expired
snapshots below the requested offset fail loudly at the missing manifest
list. Local/NFS paths, like its siblings.
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from projectdatalake_spark.sources.avro_codec import read_container

CDF_META = (("_change_type", "string"), ("_commit_seq", "bigint"))


def _current_metadata(root: str) -> dict:
    hint = os.path.join(root, "metadata", "version-hint.text")
    if os.path.exists(hint):
        v = int(open(hint).read().strip())
    else:
        best = -1
        for name in os.listdir(os.path.join(root, "metadata")):
            if name.startswith("v") and name.endswith(".metadata.json"):
                stem = name[1 : -len(".metadata.json")]
                if stem.isdigit():
                    best = max(best, int(stem))
        if best < 0:
            raise FileNotFoundError(f"not an Iceberg table: {root}")
        v = best
    return json.load(open(os.path.join(root, "metadata", f"v{v}.metadata.json")))


def _read_avro(path: str):
    with open(path, "rb") as fh:
        return read_container(fh.read())


class IcebergChangePartition(InputPartition):
    """One added data file (insert) or one position-delete file (delete).
    Self-contained for the sessionless worker: paths, output column
    order, typed partition values, change kind, sequence number."""

    def __init__(
        self,
        kind: str,  # 'insert' | 'delete'
        path: str,  # data file (insert) or delete file (delete)
        seq: int,
        cols: list[str],
        part_vals: dict,
        target_parts: dict | None = None,  # delete: data-file → partition tuple
    ):
        self.kind = kind
        self.path = path
        self.seq = seq
        self.cols = cols
        self.part_vals = part_vals
        self.target_parts = target_parts or {}


class IcebergChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options["path"].rstrip("/")
        self.start_offset = int(options.get("startingSequence", "0")) - 1
        self.max_rows = int(options.get("maxRowsPerBatch", "1000000"))

    def initialOffset(self):
        return {"seq": self.start_offset}

    def latestOffset(self):
        meta = _current_metadata(self.root)
        return {"seq": max(meta.get("last-sequence-number", 0), self.start_offset)}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["seq"], end["seq"]
        meta = _current_metadata(self.root)
        schema = next(
            s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
        )
        cols = [f["name"] for f in schema["fields"]]
        parts: list[IcebergChangePartition] = []
        budget = self.max_rows

        def spend(n: int) -> None:
            nonlocal budget
            budget -= n
            if budget < 0:
                raise ValueError(
                    f"change delta ({lo}, {hi}] exceeds maxRowsPerBatch="
                    f"{self.max_rows}; raise the option or consume smaller "
                    "sequence ranges"
                )

        for snap in meta.get("snapshots", []):
            seq = snap["sequence-number"]
            if seq <= lo or seq > hi:
                continue
            sid = snap["snapshot-id"]
            _, manifests = _read_avro(snap["manifest-list"])
            # data-file → partition tuple at THIS snapshot (used to restore
            # partition columns on delete rows, whose data files omit them)
            part_of: dict[str, dict] = {}
            for m in manifests:
                if m.get("content", 0) == 0:
                    _, rows_all = _read_avro(m["manifest_path"])
                    for e in rows_all:
                        if e["status"] in (0, 1):
                            part_of[e["data_file"]["file_path"]] = dict(
                                e["data_file"].get("partition") or {}
                            )
            for m in manifests:
                if m["added_snapshot_id"] != sid:
                    continue  # carried over from a prior snapshot
                _, entries = _read_avro(m["manifest_path"])
                for e in entries:
                    if e["status"] != 1:  # only files ADDED by this snapshot
                        continue
                    df_rec = e["data_file"]
                    spend(df_rec.get("record_count", 0))
                    if m.get("content", 0) == 0:
                        parts.append(
                            IcebergChangePartition(
                                "insert",
                                df_rec["file_path"],
                                seq,
                                cols,
                                dict(df_rec.get("partition") or {}),
                            )
                        )
                    else:  # delete manifest
                        if df_rec.get("content") == 2:
                            raise ValueError(
                                "equality deletes (content=2) are not "
                                "row-exact in a CDF stream without replaying "
                                "matching state — read the table with "
                                "IcebergTable.snapshot() instead"
                            )
                        parts.append(
                            IcebergChangePartition(
                                "delete", df_rec["file_path"], seq, cols, {},
                                target_parts=part_of,
                            )
                        )
        return parts

    def read(self, partition: IcebergChangePartition):
        import pyarrow.parquet as pq

        tail = (partition.kind, partition.seq)
        if partition.kind == "insert":
            recs = pq.read_table(partition.path).to_pylist()
            rows = []
            for r in recs:
                merged = {**r, **partition.part_vals}
                rows.append(tuple(merged.get(c) for c in partition.cols) + tail)
            return iter(rows)
        # delete: the file holds (file_path, pos); resolve rows per target
        pairs = pq.read_table(partition.path).to_pylist()
        by_target: dict[str, list[int]] = {}
        for p in pairs:
            fp = p["file_path"]
            if fp.startswith("file:"):
                fp = fp[5:]
            by_target.setdefault(fp, []).append(p["pos"])
        rows = []
        for target, positions in by_target.items():
            tbl = pq.read_table(target)
            taken = tbl.take(sorted(positions)).to_pylist()
            parts_vals = partition.target_parts.get(target, {})
            for r in taken:
                merged = {**r, **parts_vals}
                rows.append(tuple(merged.get(c) for c in partition.cols) + tail)
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass


class IcebergChangesDataSource(DataSource):
    """``spark.readStream.format("iceberg_changes").option("path", root)``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_changes"

    def schema(self) -> str:
        meta = _current_metadata(self.options["path"].rstrip("/"))
        ice = next(
            s for s in meta["schemas"] if s["schema-id"] == meta["current-schema-id"]
        )
        back = {
            "int": "int", "long": "bigint", "float": "float", "double": "double",
            "string": "string", "boolean": "boolean", "date": "date",
            "timestamp": "timestamp_ntz", "timestamptz": "timestamp",
        }
        cols = []
        for f in ice["fields"]:
            t = f["type"]
            if not isinstance(t, str) or (t not in back and not t.startswith("decimal")):
                raise ValueError(f"unsupported iceberg type for streaming: {t!r}")
            cols.append(f"{f['name']} {back.get(t, t)}")
        extra = ", ".join(f"{n} {t}" for n, t in CDF_META)
        return ", ".join(cols) + ", " + extra


    def streamReader(self, schema):
        return IcebergChangesStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(IcebergChangesDataSource)
