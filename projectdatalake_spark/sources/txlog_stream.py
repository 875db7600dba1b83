"""Stream a txlog table's change data feed (the 'Delta as a streaming
source' analog): a Python Data Source whose offsets are COMMIT VERSIONS.

Each micro-batch delivers the CDF rows of the commits that landed since
the last processed version — tagged ``_change_type`` ('insert'/'delete')
and ``_commit_version`` — so a downstream streaming job (incremental
aggregate maintenance, index sync, cache invalidation) consumes exactly
each commit's delta, exactly once: offsets are checkpointed by Structured
Streaming, and replaying ``(lo, hi]`` is deterministic because the commit
log is immutable. Semantics mirror ``TxTable.changes`` (txlog.py):
append → inserts; overwrite/replace/delete → deletes of the replaced
files' rows (+ inserts of any new); deletion-vector commits → only the
masked rows as deletes; ``optimize`` is data-neutral and skipped.

Implementation: the Python Data Source worker process has NO SparkSession
(verified — ``SparkSession.getActiveSession()`` is None there), so this
reader replays the commit log with plain json + pyarrow. That is the
right shape for the SIMPLE stream reader anyway: ``read`` runs driver-side
and should stay bounded (the CDC regime — a merge touches 0.1% of the
table); ``maxRowsPerBatch`` enforces it. A feed whose single commit can
carry terabytes would implement the partition-based
``DataSourceStreamReader`` instead, mapping each changed file to an
InputPartition (offsets and semantics identical). Local/NFS paths only —
an object-store deployment would swap the ``open``/``glob`` calls for
fsspec. Vacuum retention bounds consumer lag exactly as in Delta CDF:
replaying a delete needs the removed file to still exist.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

_LOG_DIR = "_txlog"
CDF_META = (("_change_type", "string"), ("_commit_version", "bigint"))


def _commits(root: str) -> list[dict]:
    out = []
    for f in sorted(glob.glob(os.path.join(root, _LOG_DIR, "*.json"))):
        if f.endswith(".checkpoint.json"):
            continue
        with open(f) as fh:
            out.append(json.load(fh))
    return out


def _schema_walk(commits: list[dict]) -> tuple[dict[str, str], dict[str, str]]:
    """(physical→type, physical→logical): fold each commit's physical
    schema in order, then apply rename_column rewires — same walk as
    TxTable.column_mapping/logical_schema, sans Spark."""
    phys: dict[str, str] = {}
    logical_of: dict[str, str] = {}
    for c in commits:
        for col, typ in (c.get("schema") or {}).items():
            phys.setdefault(col, typ)
            logical_of.setdefault(col, col)
        if c.get("op") == "rename_column":
            ren = c["rename"]
            for p, l in list(logical_of.items()):
                if l == ren["old"]:
                    logical_of[p] = ren["new"]
        if c.get("op") == "clone":
            mapping = c.get("column_mapping") or {}
            logical_of = {p: l for l, p in mapping.items()}
            for col in phys:
                logical_of.setdefault(col, col)
    return phys, logical_of


def _schema_fields(commits: list[dict]) -> list[tuple[str, str]]:
    phys, logical_of = _schema_walk(commits)
    return [(logical_of[p], t) for p, t in phys.items()]


class TxLogChangesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.root = options["path"]
        # -1 → from the beginning (version 0's create counts as inserts)
        self.start_version = int(options.get("startingVersion", "-1"))
        self.max_rows = int(options.get("maxRowsPerBatch", "1000000"))

    def initialOffset(self):
        return {"version": self.start_version}

    # -- pure-python CDF replay -------------------------------------------

    def _read_file_rows(self, commits, rel: str, base: str) -> list[dict]:
        import pyarrow.parquet as pq

        out = pq.read_table(os.path.join(base, rel)).to_pylist()
        # hive partition columns live in the path, not the file
        for part in rel.split("/")[:-1]:
            if "=" in part:
                k, v = part.split("=", 1)
                for r in out:
                    r.setdefault(k, v)
        return out

    def _delta(self, lo: int, hi: int):
        commits = _commits(self.root)
        _phys, phys_to_logical = _schema_walk(commits)
        logical_cols = [phys_to_logical[p] for p in _phys]
        base_of = {}
        for c in commits:
            for a in c.get("adds", []):
                base_of[a["path"]] = a.get("base", self.root)

        rows: list[tuple] = []

        def emit(rel: str, kind: str, version: int, mask: set[int] | None = None):
            recs = self._read_file_rows(commits, rel, base_of.get(rel, self.root))
            for idx, r in enumerate(recs):
                if mask is not None and idx not in mask:
                    continue
                logical = {phys_to_logical.get(k, k): v for k, v in r.items()}
                rows.append(
                    tuple(logical.get(c) for c in logical_cols) + (kind, version)
                )
                if len(rows) > self.max_rows:
                    raise ValueError(
                        f"CDF delta ({lo}, {hi}] exceeds maxRowsPerBatch="
                        f"{self.max_rows}; raise the option or consume "
                        "smaller version ranges"
                    )

        for c in commits:
            v = c["version"]
            if v <= lo or v > hi or c.get("op") == "optimize":
                continue
            if "dv" in c:
                dv = c["dv"]
                import pyarrow.parquet as pq

                dv_tbl = pq.read_table(
                    os.path.join(self.root, dv["path"])
                ).to_pylist()
                for rel in dv["files"]:
                    mask = {
                        m["row_index"]
                        for m in dv_tbl
                        if m["file_path"].endswith(rel)
                    }
                    if mask:
                        emit(rel, "delete", v, mask)
            for a in c.get("adds", []):
                emit(a["path"], "insert", v)
            for rel in c.get("removes", []):
                emit(rel, "delete", v)
        return iter(rows)

    def read(self, start: dict):
        commits = _commits(self.root)
        latest = commits[-1]["version"] if commits else -1
        lo = start["version"]
        if latest <= lo:
            return iter([]), start
        return self._delta(lo, latest), {"version": latest}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._delta(start["version"], end["version"])


class TxLogChangesSource(DataSource):
    """spark.readStream.format("txlog_changes").option("path", root)"""

    @classmethod
    def name(cls) -> str:
        return "txlog_changes"

    def schema(self) -> str:
        fields = _schema_fields(_commits(self.options["path"])) + list(CDF_META)
        return ", ".join(f"`{c}` {typ}" for c, typ in fields)

    def simpleStreamReader(self, schema) -> TxLogChangesStreamReader:
        return TxLogChangesStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TxLogChangesSource)
