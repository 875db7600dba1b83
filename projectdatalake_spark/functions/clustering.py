"""Multi-dimensional clustering expressions shared by the table formats.

Z-ordering: quantile-bin each clustering column into 2^bits ranks (one
driver-side approxQuantile pass — no global sort, no single-partition
window), interleave the rank bits into one Z-value, and range-partition
on it. Every output file then covers a small hyper-rectangle of the key
space, so write-time min/max stats are tight on EVERY clustered column
at once — the public Z-ordering design Delta and Iceberg document.
Used by txlog OPTIMIZE (zorder_by), Delta OPTIMIZE ZORDER BY, and
available to Iceberg rewrites.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_column(df: DataFrame, cols: tuple[str, ...], bits: int = 8) -> Column:
    """Interleaved-bit Z-value over ``cols`` (see module docstring)."""
    n_bins = (1 << bits) - 1
    probs = [i / n_bins for i in range(1, n_bins)]
    rank_cols = []
    for c in cols:
        dbl = F.col(c).cast("double")
        qs = df.select(dbl.alias("v")).na.drop().approxQuantile("v", probs, 0.01)
        # strictly increasing boundary list (ties collapse bins)
        bounds = sorted(set(qs))
        if not bounds:  # empty / all-NULL column: single bin
            rank_cols.append(F.lit(0).cast("bigint"))
            continue
        blit = F.array(*[F.lit(float(b)) for b in bounds])
        rank = F.size(F.filter(blit, lambda b: b <= dbl))
        rank_cols.append(F.coalesce(rank, F.lit(0)).cast("bigint"))
    z = F.lit(0).cast("bigint")
    for bit in range(bits):
        for i, rank in enumerate(rank_cols):
            pos = bit * len(rank_cols) + i
            z = z + F.shiftleft(F.shiftright(rank, bit).bitwiseAND(F.lit(1)), pos)
    return z
