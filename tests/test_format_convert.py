"""Zero-copy Delta ⇄ Iceberg conversion (sources/format_convert.py):
values identical, zero data files copied, pruning works on the converted
side, and the honesty refusals (DVs, position deletes, renames on
name-resolved tables) fire."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from projectdatalake_spark.sources.delta_interop import DeltaProtocolError, DeltaTable
from projectdatalake_spark.sources.format_convert import (
    convert_delta_to_iceberg,
    convert_iceberg_to_delta,
)
from projectdatalake_spark.sources.iceberg_interop import (
    IcebergProtocolError,
    IcebergTable,
)


def _df(spark):
    return (
        spark.range(0, 90)
        .withColumn("seg", (F.col("id") % 3).cast("int"))
        .withColumn("val", F.col("id") * 1.5)
        .repartition(4)
    )


def _no_data_files(root, meta_dirs=("metadata", "_delta_log")):
    return not any(
        f.endswith(".parquet")
        for dp, _, fs in os.walk(root)
        if not any(m in dp for m in meta_dirs)
        for f in fs
    )


def test_delta_to_iceberg_zero_copy(spark):
    droot = tempfile.mkdtemp(prefix="fc_d2i_src_")
    dt = DeltaTable.create(spark, droot, _df(spark), partition_by=("seg",))
    dest = tempfile.mkdtemp(prefix="fc_d2i_dst_")
    os.rmdir(dest)
    it = convert_delta_to_iceberg(dt, dest)
    assert _no_data_files(dest)
    got = sorted(it.snapshot().select("id", "seg", "val").collect())
    want = sorted(dt.snapshot().select("id", "seg", "val").collect())
    assert got == want
    # partition pruning works off the converted manifest tuples
    assert it.snapshot(where_eq={"seg": [1]}).count() == 30
    # delta stats became iceberg bounds → range skipping works
    assert it.snapshot(where={"id": (80, None)}).count() < 90
    assert it.snapshot(where={"id": (80, None)}).filter("id >= 80").count() == 10
    # renames refused: foreign files carry no field ids (name resolution)
    with pytest.raises(IcebergProtocolError, match="name-resolved"):
        it.rename_column("val", "v2")


def test_iceberg_to_delta_zero_copy(spark):
    iroot = tempfile.mkdtemp(prefix="fc_i2d_src_")
    it = IcebergTable.create(spark, iroot, _df(spark), partition_by=("seg",))
    dest = tempfile.mkdtemp(prefix="fc_i2d_dst_")
    os.rmdir(dest)
    dt = convert_iceberg_to_delta(it, dest)
    assert _no_data_files(dest)
    got = sorted(dt.snapshot().select("id", "seg", "val").collect())
    want = sorted(it.snapshot().select("id", "seg", "val").collect())
    assert got == want
    assert dict(dt.snapshot().dtypes)["seg"] == "int"
    assert dt.snapshot(where_eq={"seg": [2]}).filter("seg = 2").count() == 30


def test_convert_refusals(spark):
    droot = tempfile.mkdtemp(prefix="fc_ref_d_")
    dt = DeltaTable.create(spark, droot, _df(spark))
    dt.delete_where_dv("id = 5")
    with pytest.raises(DeltaProtocolError, match="deletion vectors"):
        convert_delta_to_iceberg(dt, tempfile.mkdtemp(prefix="fc_x_") + "/t")
    # after optimize materializes the DVs, conversion proceeds
    dt.optimize()
    it = convert_delta_to_iceberg(dt, tempfile.mkdtemp(prefix="fc_ok_") + "/t")
    assert it.snapshot().count() == 89

    iroot = tempfile.mkdtemp(prefix="fc_ref_i_")
    it2 = IcebergTable.create(spark, iroot, _df(spark))
    it2.delete_where("id = 5")
    with pytest.raises(IcebergProtocolError, match="position deletes"):
        convert_iceberg_to_delta(it2, tempfile.mkdtemp(prefix="fc_y_") + "/t")


def test_round_trip_delta_iceberg_delta(spark):
    droot = tempfile.mkdtemp(prefix="fc_loop_")
    dt = DeltaTable.create(spark, droot, _df(spark), partition_by=("seg",))
    ice = convert_delta_to_iceberg(dt, tempfile.mkdtemp(prefix="fc_loop_i_") + "/t")
    back = convert_iceberg_to_delta(ice, tempfile.mkdtemp(prefix="fc_loop_d_") + "/t")
    got = sorted(back.snapshot().select("id", "seg", "val").collect())
    want = sorted(dt.snapshot().select("id", "seg", "val").collect())
    assert got == want  # the loop is lossless, three tables, ONE copy of the data


def test_lifecycle_after_delta_to_iceberg_convert(spark):
    """Conversion + maintenance COMPOSE (round-5 verdict item 6): a
    zero-copy converted Iceberg table survives the full maintenance
    lifecycle — append, equality delete, compaction, expire — and expire
    must NEVER delete the foreign (Delta-owned) files it references,
    or the source table breaks."""
    droot = tempfile.mkdtemp(prefix="fc_lc_d_")
    dt = DeltaTable.create(spark, droot, _df(spark), partition_by=("seg",))
    iroot = tempfile.mkdtemp(prefix="fc_lc_i_") + "/t"
    ice = convert_delta_to_iceberg(dt, iroot)
    # lifecycle on the CONVERTED table
    extra = (
        spark.range(1000, 1030)
        .withColumn("seg", (F.col("id") % 3).cast("int"))
        .withColumn("val", F.col("id") * 1.5)
    )
    ice.append(extra)
    ice.delete_equality(spark.range(0, 10).select("id"))
    assert ice.snapshot().count() == 90 + 30 - 10
    ice.rewrite_data_files()  # materializes the MOR state into owned files
    res = ice.expire_snapshots(retain=1)
    assert res["snapshots"] >= 3
    # converted table still correct end-to-end
    assert ice.snapshot().count() == 110
    assert ice.snapshot().filter("id < 10").count() == 0
    # ownership guard: every Delta-owned data file survived expire, and
    # the SOURCE table still reads perfectly
    assert DeltaTable(spark, droot).snapshot().count() == 90


def test_lifecycle_after_iceberg_to_delta_convert(spark):
    """The other direction: converted Delta table runs append, DV
    delete, optimize, checkpoint and vacuum; vacuum reclaims only files
    under ITS root, so the foreign Iceberg-owned files survive and the
    source table keeps reading."""
    iroot = tempfile.mkdtemp(prefix="fc_lc_i2_") + "/t"
    ice = IcebergTable.create(spark, iroot, _df(spark), partition_by=("seg",))
    droot = tempfile.mkdtemp(prefix="fc_lc_d2_") + "/t"
    dt = convert_iceberg_to_delta(ice, droot)
    extra = (
        spark.range(1000, 1030)
        .withColumn("seg", (F.col("id") % 3).cast("int"))
        .withColumn("val", F.col("id") * 1.5)
    )
    dt.append(extra)
    dt.delete_where_dv("id < 10")
    assert dt.snapshot().count() == 90 + 30 - 10
    dt.optimize()          # materializes DVs into owned compacted files
    dt.checkpoint()
    dt.vacuum(retain_versions=1)
    fresh = DeltaTable(spark, droot)
    assert fresh.snapshot().count() == 110
    assert fresh.snapshot().filter("id < 10").count() == 0
    # source Iceberg table untouched by the Delta-side lifecycle
    assert IcebergTable(spark, iroot).snapshot().count() == 90


def test_delta_to_txlog_zero_copy(spark, tmp_path):
    """Delta → txlog by reference: no data moves (adds carry base=delta
    root), stats map across so interval reads still skip, and the txlog
    table evolves independently afterwards."""
    import os

    from projectdatalake_spark.sources.format_convert import (
        convert_delta_to_txlog,
    )

    df = (
        spark.range(0, 2000)
        .withColumn("seg", (F.col("id") % 3).cast("int"))
        .withColumn("val", F.col("id") * 1.0)
    )
    d = DeltaTable.create(
        spark, str(tmp_path / "d"),
        df.repartitionByRange(4, "id"), partition_by=("seg",),
    )
    t = convert_delta_to_txlog(d, str(tmp_path / "t"))
    assert t.snapshot().count() == 2000
    assert {r.seg for r in t.snapshot().select("seg").distinct().collect()} == {0, 1, 2}
    # zero copy: every data file lives under the DELTA root
    assert all(
        t._data_path(a).startswith(str(tmp_path / "d")) for a in t._active_files()
    )
    assert not any(
        f.endswith(".parquet")
        for f in os.listdir(str(tmp_path / "t"))
    )
    # stats mapped: an interval read plans fewer files than the table has
    pruned = t.snapshot(where={"id": (0, 100)})
    assert 0 < len(pruned.inputFiles()) < len(t._active_files())
    assert pruned.filter("id <= 100").count() == 101
    # independent evolution: txlog appends do not touch the delta source
    t.append(df.limit(5))
    assert t.snapshot().count() == 2005 and d.snapshot().count() == 2000
    # DV tables fall back to a materializing copy (rows still exact)
    d.delete_where_dv("id % 100 = 0")
    t2 = convert_delta_to_txlog(d, str(tmp_path / "t2"))
    assert t2.snapshot().count() == 1980
    assert t2._active_files() and all(
        t2._data_path(a).startswith(str(tmp_path / "t2"))
        for a in t2._active_files()
    )


def test_iceberg_to_txlog_zero_copy_and_fallback(spark, tmp_path):
    from projectdatalake_spark.sources.format_convert import (
        convert_iceberg_to_txlog,
    )
    from projectdatalake_spark.sources.iceberg_interop import IcebergTable

    df = (
        spark.range(0, 1500)
        .withColumn("seg", (F.col("id") % 3).cast("int"))
        .withColumn("val", F.col("id") * 2.0)
    )
    ice = IcebergTable.create(
        spark, str(tmp_path / "i"),
        df.repartitionByRange(4, "id"), partition_by=("seg",),
    )
    t = convert_iceberg_to_txlog(ice, str(tmp_path / "t"))
    assert t.snapshot().count() == 1500
    assert all(
        t._data_path(a).startswith(str(tmp_path / "i"))
        for a in t._active_files()
    )
    got = {(r.id, r.seg, r.val) for r in t.snapshot().collect()}
    want = {(r.id, r.seg, r.val) for r in ice.snapshot().collect()}
    assert got == want
    # column bounds decoded into txlog stats → interval reads skip
    pruned = t.snapshot(where={"id": (0, 50)})
    assert len(pruned.inputFiles()) < len(t._active_files())
    # live position deletes force the materializing fallback
    ice.delete_where("id % 10 = 7")
    t2 = convert_iceberg_to_txlog(ice, str(tmp_path / "t2"))
    assert t2.snapshot().count() == 1350
    assert all(
        t2._data_path(a).startswith(str(tmp_path / "t2"))
        for a in t2._active_files()
    )


def test_uniform_export_live_sync(spark, tmp_path):
    """UniForm shape: Delta is the only writer; each sync commits one
    Iceberg REPLACE snapshot over the same files inside the Delta root
    (metadata/ beside _delta_log/). Gates: per-version reads agree
    (both current AND time-traveled), zero data copied, no-op at an
    already-exported tip, DV + schema-drift refusals."""
    from projectdatalake_spark.sources.format_convert import uniform_export

    root = str(tmp_path / "t")
    d = DeltaTable.create(spark, root, _df(spark))
    t, sid0 = uniform_export(d)
    assert sid0 is not None
    assert os.path.exists(f"{root}/metadata/version-hint.text")
    assert _no_data_files(root) is False  # delta's own data lives here
    # no SECOND copy: every iceberg-referenced file is a delta file
    def _paths(df):
        return {
            os.path.realpath(p.replace("file://", "").replace("file:", ""))
            for p in df.inputFiles()
        }

    assert _paths(t.snapshot()) <= _paths(d.snapshot())

    def rows(df):
        return sorted(map(tuple, df.select("id", "seg", "val").collect()))

    assert rows(t.snapshot()) == rows(d.snapshot())
    v_first = d.latest_version()
    # no-op sync at the exported tip
    t, again = uniform_export(d)
    assert again is None

    # delta evolves; sync again → a NEW iceberg snapshot, and the OLD
    # one still time-travels to the old delta version
    d.append(
        spark.range(100, 140)
        .withColumn("seg", (F.col("id") % 3).cast("int"))
        .withColumn("val", F.col("id") * 1.5)
    )
    t, sid1 = uniform_export(d)
    assert sid1 is not None and sid1 != sid0
    assert rows(t.snapshot()) == rows(d.snapshot())
    assert rows(t.snapshot(snapshot_id=sid0)) == rows(d.snapshot(version=v_first))
    # summary carries the mirrored delta version
    summaries = {
        s["snapshot-id"]: s["summary"].get("uniform.delta-version")
        for s in t.metadata()["snapshots"]
    }
    assert summaries[sid1] == str(d.latest_version())

    # pre-DV the export declares plain v2 (no stamp without need)
    assert t.metadata().get("format-version") == 2

    # DVs active: translated (round 10 — the pre-r10 refusal), masked
    # reads agree through the exported metadata
    d.delete_where_dv("id = 7")
    v_pre_dv = t.current_metadata_version()
    t, sid_dv = uniform_export(d)
    assert sid_dv is not None
    assert rows(t.snapshot()) == rows(d.snapshot())
    assert t.inspect("delete_files").count() > 0
    # the DV sync stamped format-version 3 (+ the deviation property):
    # a pre-v3 reader must now refuse loudly instead of skipping the
    # PUFFIN delete files and resurrecting the masked rows (ADVICE r10)
    meta_v3 = t.metadata()
    assert meta_v3.get("format-version") == 3
    assert meta_v3["properties"].get("uniform.dv-v3-deletes") == "true"
    # ...and ATOMICALLY: one metadata commit, so no observable version
    # ever pairs a v2 declaration with PUFFIN delete files (ADVICE r11
    # closed the two-commit crash/read window)
    assert t.current_metadata_version() == v_pre_dv + 1
    d.optimize()  # materializes the DVs into owned files
    t, sid2 = uniform_export(d)
    assert sid2 is not None
    assert rows(t.snapshot()) == rows(d.snapshot())
    # a full-state replacement: the DV entries do NOT linger post-optimize
    assert t.inspect("delete_files").count() == 0
    # ...but the v3 declaration is STICKY: older DV-carrying snapshots
    # stay time-travelable, so the table never downgrades to v2
    assert t.metadata().get("format-version") == 3
    d.append(
        spark.range(500, 510)
        .withColumn("seg", (F.col("id") % 3).cast("int"))
        .withColumn("val", F.col("id") * 1.5)
        .withColumn("extra", F.lit(1)),
        merge_schema=True,
    )
    with pytest.raises(IcebergProtocolError, match="drifted"):
        uniform_export(d)


def test_uniform_dv_translation_details(spark, tmp_path):
    """Round-10 DV decision (translate, don't refuse) — the metadata-
    level gates: (a) the sync under live DVs writes ONE puffin with a
    deletion-vector-v1 blob per masked file, content=1 entries carrying
    referenced_data_file + blob addressing; (b) blob payloads decode to
    exactly the Delta-side masked positions; (c) rows appended AFTER the
    delete escape the mask (DVs bind to files); (d) the one-shot convert
    still refuses under DVs."""
    from projectdatalake_spark.sources.format_convert import (
        convert_delta_to_iceberg,
        uniform_export,
    )
    from projectdatalake_spark.sources.puffin import (
        dv_blob_positions,
        read_puffin,
    )

    root = str(tmp_path / "t")
    d = DeltaTable.create(spark, root, _df(spark))
    d.delete_where_dv("id % 7 = 3")
    t, sid = uniform_export(d)
    assert sid is not None
    dels = t.inspect("delete_files").collect()
    assert dels and all(r.content == 1 for r in dels)
    # every masked Delta add has exactly one DV entry, same puffin file
    masked_adds = [
        d._abs_data_path(a["path"])
        for a in d._state()["adds"].values()
        if a.get("deletionVector")
    ]
    assert len(dels) == len(masked_adds)
    puffins = {r.file_path for r in dels}
    assert len(puffins) == 1
    blobs, _props = read_puffin(
        open(next(iter(puffins)).replace("file:", ""), "rb").read()
    )
    by_file = {
        b["properties"]["referenced-data-file"]: payload
        for b, payload in blobs
    }
    assert sorted(by_file) == sorted(masked_adds)
    for a in d._state()["adds"].values():
        dv = a.get("deletionVector")
        if not dv:
            continue
        want = sorted(d._dv_deleted_rows(dv))
        got = sorted(dv_blob_positions(by_file[d._abs_data_path(a["path"])]))
        assert got == want
    # (c) post-delete appends escape the mask
    d.append(
        spark.range(700, 710)
        .withColumn("seg", (F.col("id") % 3).cast("int"))
        .withColumn("val", F.col("id") * 1.5)
    )
    t, _ = uniform_export(d)
    ids = {r.id for r in t.snapshot().collect()}
    assert {x for x in range(700, 710)} <= ids
    assert ids == {r.id for r in d.snapshot().collect()}
    # (d) the one-shot convert keeps its refusal
    with pytest.raises(DeltaProtocolError, match="deletion vectors"):
        convert_delta_to_iceberg(
            d, str(tmp_path / "x")
        )
