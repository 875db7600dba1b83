"""Empirical probe: can parquet FOOTER statistics reproduce the Spark
min/max/nullCount stats pass bit-for-bit?  (OPTIMIZATION r13 lever #1 —
replace the per-commit full re-read in txlog/delta/iceberg _attach_stats
with footer-derived stats.)

Writes adversarial columns through the SAME writer the lifecycle tables
use (Spark's parquet writer, zstd-default confs from session.py), then
compares, per column:
  - Spark:    F.min / F.max / F.sum(isNull) grouped by input_file_name
  - footer:   pyarrow ParquetFile.metadata row-group statistics

Edge cases probed: NaN / ±Inf / -0.0 doubles, all-NaN, all-null, long
strings (64B/2KB boundaries for truncation), unicode, timestamps, dates,
decimals, booleans, shorts/bytes, negative ints.
"""

from __future__ import annotations

import datetime
import decimal
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import Row, functions as F, types as T

from projectdatalake_spark.session import get_spark


def main() -> None:
    spark = get_spark("footer-probe", shuffle_partitions=4)
    out = "/tmp/footer_probe_parquet"
    shutil.rmtree(out, ignore_errors=True)

    rows = [
        # id, dbl, flt, s, ts, dt, dec, b, i16, i64
        Row(id=1, dbl=1.5, flt=2.5, s="alpha", ts=datetime.datetime(2020, 1, 2, 3, 4, 5, 123456),
            dt=datetime.date(2020, 1, 2), dec=decimal.Decimal("123.45"), b=True, i16=3, i64=-7),
        Row(id=2, dbl=float("nan"), flt=float("nan"), s="b" * 63, ts=datetime.datetime(2021, 6, 7),
            dt=datetime.date(2021, 6, 7), dec=decimal.Decimal("-0.01"), b=False, i16=-32768, i64=2**62),
        Row(id=3, dbl=float("inf"), flt=float("-inf"), s="c" * 64, ts=None,
            dt=None, dec=None, b=None, i16=None, i64=None),
        Row(id=4, dbl=-0.0, flt=0.0, s="d" * 65, ts=datetime.datetime(1969, 12, 31, 23, 59, 59),
            dt=datetime.date(1969, 12, 31), dec=decimal.Decimal("99999.99"), b=True, i16=32767, i64=-(2**62)),
        Row(id=5, dbl=None, flt=None, s="é≠☃ unicode" + "x" * 100, ts=datetime.datetime(2030, 12, 31),
            dt=datetime.date(2030, 12, 31), dec=decimal.Decimal("0.00"), b=False, i16=0, i64=0),
        Row(id=6, dbl=3.25, flt=-1.25, s="z" * 3000, ts=datetime.datetime(2020, 1, 2, 3, 4, 5),
            dt=datetime.date(2000, 2, 29), dec=decimal.Decimal("-99999.99"), b=True, i16=1, i64=1),
    ]
    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("dbl", T.DoubleType()),
        T.StructField("flt", T.FloatType()),
        T.StructField("s", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("dt", T.DateType()),
        T.StructField("dec", T.DecimalType(7, 2)),
        T.StructField("b", T.BooleanType()),
        T.StructField("i16", T.ShortType()),
        T.StructField("i64", T.LongType()),
    ])
    df = spark.createDataFrame(rows, schema).coalesce(1)
    # timestamp_ntz twin (the working type of the corpus tables)
    df = df.withColumn("tsn", F.col("ts").cast("timestamp_ntz"))
    print("outputTimestampType:",
          spark.conf.get("spark.sql.parquet.outputTimestampType"))
    df.write.mode("overwrite").parquet(out)

    # extra files: all-NaN column, all-null column
    spark.createDataFrame(
        [Row(id=1, dbl=float("nan")), Row(id=2, dbl=float("nan"))],
        "id int, dbl double",
    ).coalesce(1).write.mode("overwrite").parquet(out + "_allnan")
    spark.createDataFrame(
        [Row(id=1, dbl=None), Row(id=2, dbl=None)], "id int, dbl double"
    ).coalesce(1).write.mode("overwrite").parquet(out + "_allnull")

    for d in (out, out + "_allnan", out + "_allnull"):
        print(f"\n===== {d}")
        sdf = spark.read.parquet(d)
        cols = sdf.columns
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in cols:
            aggs += [F.min(c).alias(f"min__{c}"), F.max(c).alias(f"max__{c}"),
                     F.sum(F.col(c).isNull().cast("long")).alias(f"null__{c}")]
        srow = sdf.groupBy(F.input_file_name()).agg(*aggs).collect()[0].asDict()
        fname = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
        md = pq.ParquetFile(os.path.join(d, fname)).metadata
        print(f"created_by: {md.created_by}; num_rows={md.num_rows} (spark __n={srow['__n']})")
        for rg in range(md.num_row_groups):
            for ci in range(md.row_group(rg).num_columns):
                col = md.row_group(rg).column(ci)
                st = col.statistics
                name = col.path_in_schema
                smin, smax, snull = srow.get(f"min__{name}"), srow.get(f"max__{name}"), srow.get(f"null__{name}")
                if st is None:
                    print(f"  {name:>5}: NO STATS (physical {col.physical_type}) | spark min={smin!r} max={smax!r} nulls={snull}")
                    continue
                try:
                    mn, mx = st.min, st.max
                    desc = (
                        f"min={mn!r} max={mx!r} "
                        f"(types {type(mn).__name__}/{type(mx).__name__})"
                    )
                except Exception as e:
                    desc = (
                        f"logical-cast FAILED ({e}); raw min={st.min_raw!r} "
                        f"max={st.max_raw!r} physical={col.physical_type}"
                    )
                print(
                    f"  {name:>5}: has_min_max={st.has_min_max} {desc} "
                    f"nulls={st.null_count} | spark min={smin!r} max={smax!r} nulls={snull}"
                )

    print("\npyarrow version:", pa.__version__)
    spark.stop()


if __name__ == "__main__":
    main()
