"""Three-way MERGE scaling probe: does merge cost track the UPDATES or
the TABLE?

Builds the same logical table at 1x and 8x row counts in each format
(txlog / Delta / Iceberg), applies the IDENTICAL narrow update batch
(1,000 keys in one partition's key range), and reports wall seconds.

The 100 TB claim under test, per format:
- txlog   merge_upsert: partition-scoped rewrite — cost ~ the touched
          partition's size (grows with the table unless partitions are
          added rather than grown).
- Delta   merge_upsert: stats-pruned touched-FILE rewrite — with
          range-clustered files the touched set is constant, so cost
          should stay ~flat as the table grows.
- Iceberg merge_upsert: merge-on-read (equality delete + same-seq data)
          — no data file read or rewritten, cost ~O(|updates|): flat.

Usage: python tools/probe_merge_scale.py   (writes one JSON line)
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from projectdatalake_spark.session import get_spark  # noqa: E402

N_BASE = 120_000
N_UPD = 1_000


def corpus(spark, mult: int):
    # partition key = contiguous range bucket: growing the table ADDS
    # partitions (the deployment shape partition-scoped merge assumes)
    # instead of growing each one
    n = N_BASE * mult
    return (
        spark.range(0, n)
        .select(
            F.col("id").alias("k"),
            F.floor(F.col("id") / 15_000).cast("int").alias("pb"),
            (F.col("id") * 1.5).alias("v"),
        )
        .repartitionByRange(8 * mult, "k")  # contiguous key range per file
    )


def updates(spark):
    # narrow contiguous key range: ONE txlog partition, one Delta range
    # file, one equality-delete file
    return spark.range(4000, 4000 + N_UPD).select(
        F.col("id").alias("k"),
        F.floor(F.col("id") / 15_000).cast("int").alias("pb"),
        F.lit(-1.0).alias("v"),
    )


def timed(fn, reps: int = 3):
    import statistics

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 3)


def main() -> None:
    spark = get_spark("merge-probe")
    out: dict = {"n_base": N_BASE, "n_updates": N_UPD}
    for mult in (1, 8):
        df = corpus(spark, mult)
        upd = updates(spark)

        from projectdatalake_spark.sources.txlog import TxTable

        troot = tempfile.mkdtemp(prefix=f"probe_tx_{mult}x_")
        tx = TxTable.create(spark, troot, df, partition_by=("pb",))
        out[f"txlog_{mult}x"] = timed(
            lambda: tx.merge_upsert(upd, keys=["k"])
        )

        from projectdatalake_spark.sources.delta_interop import DeltaTable

        droot = tempfile.mkdtemp(prefix=f"probe_dl_{mult}x_") + "/t"
        dt = DeltaTable.create(spark, droot, df)
        out[f"delta_{mult}x"] = timed(
            lambda: dt.merge_upsert(upd, keys=["k"])
        )
        out[f"delta_{mult}x_files"] = len(dt._state()["adds"])

        from projectdatalake_spark.sources.iceberg_interop import IcebergTable

        iroot = tempfile.mkdtemp(prefix=f"probe_ic_{mult}x_") + "/t"
        it = IcebergTable.create(spark, iroot, df)
        out[f"iceberg_{mult}x"] = timed(
            lambda: it.merge_upsert(upd, keys=["k"])
        )
    for fmt in ("txlog", "delta", "iceberg"):
        out[f"{fmt}_growth"] = round(out[f"{fmt}_8x"] / out[f"{fmt}_1x"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
