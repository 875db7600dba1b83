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
