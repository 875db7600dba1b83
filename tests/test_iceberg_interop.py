"""Iceberg v2 interop: metadata-tree conformance and read semantics.

The writer (sources/iceberg_interop.py) must produce the spec's
filesystem-catalog layout — version-hinted metadata JSON, Avro manifest
lists, Avro manifests with per-file partition tuples — and the reader
must replay it (time travel by snapshot id, partition pruning from
manifest tuples, typed identity-partition restoration). Manifest Avro
bytes are additionally opened with the REAL Apache Avro library on the
JVM classpath, proving a genuine Iceberg reader's Avro layer would parse
them."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from projectdatalake_spark.sources.avro_codec import read_container
from projectdatalake_spark.sources.iceberg_interop import (
    IcebergCommitConflict,
    IcebergProtocolError,
    IcebergTable,
)


def _df(spark, lo=0, hi=100, seg_mod=3):
    return (
        spark.range(lo, hi)
        .withColumn("seg", (F.col("id") % seg_mod).cast("int"))
        .withColumn("val", F.col("id") * 2.5)
        .repartition(4)
    )


@pytest.fixture()
def root():
    yield tempfile.mkdtemp(prefix="iceberg_test_")


def test_metadata_tree_layout(spark, root):
    t = IcebergTable.create(spark, root, _df(spark), partition_by=("seg",))
    meta_dir = os.path.join(root, "metadata")
    names = [f for f in os.listdir(meta_dir) if not f.startswith(".")]
    assert "version-hint.text" in names
    assert "v0.metadata.json" in names and "v1.metadata.json" in names
    assert any(n.startswith("snap-") and n.endswith(".avro") for n in names)
    assert any(n.endswith("-m0.avro") for n in names)
    meta = json.load(open(f"{meta_dir}/v1.metadata.json"))
    assert meta["format-version"] == 2
    assert meta["partition-specs"][0]["fields"][0] == {
        "name": "seg", "transform": "identity", "source-id": 2, "field-id": 1000,
    }
    snap = meta["snapshots"][0]
    assert snap["summary"]["operation"] == "append"
    assert meta["current-snapshot-id"] == snap["snapshot-id"]
    # schema carries stable field ids (the Iceberg evolution contract)
    ids = [f["id"] for f in meta["schemas"][0]["fields"]]
    assert ids == [1, 2, 3]


def test_manifest_partition_tuples_typed(spark, root):
    t = IcebergTable.create(spark, root, _df(spark), partition_by=("seg",))
    meta = t.metadata()
    snap = meta["snapshots"][0]
    _, manifests = read_container(t._read_bytes(snap["manifest-list"]))
    assert manifests[0]["added_files_count"] > 0
    _, entries = read_container(t._read_bytes(manifests[0]["manifest_path"]))
    parts = {e["data_file"]["partition"]["seg"] for e in entries}
    assert parts <= {0, 1, 2} and all(isinstance(p, int) for p in parts)
    total = sum(e["data_file"]["record_count"] for e in entries)
    assert total == 100
    assert all(e["data_file"]["file_format"] == "PARQUET" for e in entries)


def test_jvm_avro_parses_our_manifests(spark, root):
    t = IcebergTable.create(spark, root, _df(spark), partition_by=("seg",))
    jvm = spark.sparkContext._jvm
    meta = t.metadata()
    snap = meta["snapshots"][0]
    for path in [snap["manifest-list"]]:
        reader = jvm.org.apache.avro.generic.GenericDatumReader()
        dfr = jvm.org.apache.avro.file.DataFileReader(jvm.java.io.File(path), reader)
        rows = []
        while dfr.hasNext():
            rows.append(str(dfr.next()))
        dfr.close()
        assert rows and "manifest_path" in rows[0]
    _, manifests = read_container(t._read_bytes(snap["manifest-list"]))
    reader = jvm.org.apache.avro.generic.GenericDatumReader()
    dfr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(manifests[0]["manifest_path"]), reader
    )
    first = str(dfr.next())
    dfr.close()
    assert '"status": 1' in first and "file_path" in first


def test_read_semantics(spark, root):
    t = IcebergTable.create(spark, root, _df(spark), partition_by=("seg",))
    sid0 = t.current_snapshot_id()
    t.append(
        spark.range(100, 130)
        .withColumn("seg", F.lit(7).cast("int"))
        .withColumn("val", F.lit(0.0))
        .repartition(2)
    )
    assert t.snapshot().count() == 130
    assert t.snapshot(snapshot_id=sid0).count() == 100  # time travel
    assert dict(t.snapshot().dtypes)["seg"] == "int"  # typed restoration
    pruned = t.snapshot(where_eq={"seg": [7]})
    assert pruned.count() == 30
    fresh = IcebergTable(spark, root)
    got = sorted(fresh.snapshot().select("id", "seg", "val").collect())
    want = sorted(
        _df(spark)
        .unionByName(
            spark.range(100, 130)
            .withColumn("seg", F.lit(7).cast("int"))
            .withColumn("val", F.lit(0.0))
        )
        .select("id", "seg", "val")
        .collect()
    )
    assert got == want


def test_version_hint_recovery(spark, root):
    t = IcebergTable.create(spark, root, _df(spark, 0, 20))
    os.remove(os.path.join(root, "metadata", "version-hint.text"))
    crc = os.path.join(root, "metadata", ".version-hint.text.crc")
    if os.path.exists(crc):
        os.remove(crc)
    # hint lost (crash window): reader scans for the highest metadata file
    assert IcebergTable(spark, root).snapshot().count() == 20


def test_create_refuses_existing(spark, root):
    IcebergTable.create(spark, root, _df(spark, 0, 10))
    with pytest.raises(IcebergCommitConflict):
        IcebergTable.create(spark, root, _df(spark, 0, 10))


def test_delete_manifests_refused(spark, root):
    t = IcebergTable.create(spark, root, _df(spark, 0, 10))
    meta = t.metadata()
    snap = meta["snapshots"][0]
    _, manifests = read_container(t._read_bytes(snap["manifest-list"]))
    manifests[0]["content"] = 1  # pose as a delete manifest
    from projectdatalake_spark.sources.avro_codec import write_container
    from projectdatalake_spark.sources.iceberg_interop import _manifest_list_schema

    with open(snap["manifest-list"], "wb") as f:
        f.write(write_container(_manifest_list_schema(), manifests))
    crc = os.path.join(
        os.path.dirname(snap["manifest-list"]),
        "." + os.path.basename(snap["manifest-list"]) + ".crc",
    )
    if os.path.exists(crc):
        os.remove(crc)
    with pytest.raises(IcebergProtocolError, match="delete manifests"):
        IcebergTable(spark, root).snapshot().count()
