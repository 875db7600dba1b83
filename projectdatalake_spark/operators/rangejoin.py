"""Bucketized range join: interval × point without the per-key blowup.

A naive interval join (``a.start <= b.ts AND b.ts <= a.end``) plans as a
sort-merge/nested-loop on the equi part with the time bounds as residual:
every point is checked against every interval of its key — quadratic in
per-key fan-out, and a BroadcastNestedLoop disaster with no equi key at
all. The standard fix (interval discretization) makes the time dimension
itself an equi-key:

- each interval replicates to every time bucket it overlaps
  (``ceil(len/width)+1`` rows — bounded by interval length, not corpus),
- each point maps to its single bucket,
- the join becomes equi on ``(key..., bucket)`` with the exact bounds as
  residual — a plain shuffled hash join Catalyst and AQE handle like any
  other, with candidates per point limited to intervals overlapping that
  one bucket.

A point's bucket meets each qualifying interval's replica exactly once
(the replica in the point's own bucket), so no post-join dedup is needed.
Pick ``bucket_width`` near the typical interval length: wider buckets
mean fewer replicas but more residual comparisons; narrower the reverse.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_US = 1_000_000


def interval_point_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    on: Sequence[str] = (),
    bucket_width: str = "7 days",
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval (of the same ``on`` keys) that
    contains it: ``start <= ts <= end``. Output columns: all interval
    columns + all point columns (names must not collide apart from ``on``).

    ``how='inner'`` or ``'left'`` (left = keep unmatched POINTS, interval
    side null) are supported — the two shapes attribution pipelines use.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    seconds = _parse_seconds(bucket_width)
    width_us = seconds * _US

    def bucket_of(col: str):
        # ntz -> ltz cast is a monotone relabeling under the pinned-UTC
        # session; unix_micros only accepts TIMESTAMP (ltz)
        return F.floor(F.unix_micros(F.col(col).cast("timestamp")) / width_us)

    iv = intervals.filter(F.col(start_col) <= F.col(end_col)).withColumn(
        "__bucket", F.explode(F.sequence(bucket_of(start_col), bucket_of(end_col)))
    )
    pt = points.withColumn("__bucket", bucket_of(ts_col))

    cond = (F.col("__bucket") == F.col("__bucket_iv")) & (
        (F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    iv = iv.withColumnRenamed("__bucket", "__bucket_iv")
    for k in on:
        iv = iv.withColumnRenamed(k, f"__{k}_iv")
        cond = cond & (F.col(f"__{k}_iv") == F.col(k))
    if how == "inner":
        joined = pt.join(iv, cond)
    else:
        joined = pt.join(iv, cond, "left")
    drop = ["__bucket", "__bucket_iv"] + [f"__{k}_iv" for k in on]
    return joined.drop(*drop)


def _parse_seconds(width: str) -> int:
    qty, unit = width.split()
    unit_s = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit.lower()]
    return int(qty) * unit_s
